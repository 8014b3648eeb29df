"""Packaging + spec-hygiene checks: the --py-files zip builds and contains
the engine; per-row Python UDFs are banned (BASELINE.json:15 'no per-row
Python') — only pandas_udf / mapInPandas / mapInArrow may appear."""

from __future__ import annotations

import os
import re
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_py_files_zip_builds():
    import package

    out = package.build("dist/cdc_engine_test.zip")
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert "cdc_engine/lake.py" in names
    assert "cdc_engine/apply.py" in names
    assert "gen/walgen.py" in names
    assert not any(n.endswith(".pyc") for n in names)
    os.remove(out)


def test_no_per_row_python_udfs():
    bad = re.compile(r"F\.udf\(|@udf\b|functions\.udf\(|\budf\(lambda")
    offenders = []
    for root, _dirs, files in os.walk(os.path.join(REPO, "cdc_engine")):
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                with open(p) as f:
                    if bad.search(f.read()):
                        offenders.append(p)
    assert not offenders, f"per-row Python UDFs are banned by spec: {offenders}"


def test_no_rdd_api():
    """SURVEY.md §1.4: no RDD API anywhere in the engine."""
    bad = re.compile(r"\.rdd\b|sparkContext\.parallelize|\.mapPartitions\(")
    offenders = []
    for root, _dirs, files in os.walk(os.path.join(REPO, "cdc_engine")):
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                with open(p) as f:
                    if bad.search(f.read()):
                        offenders.append(p)
    assert not offenders, f"RDD API found: {offenders}"
