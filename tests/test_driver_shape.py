"""Driver-shape fuzz (VERDICT r2 item 8): every registry query's output
must survive the DRIVER's canonicalization — pandas ``sort_values`` over
the raw output columns — which crashes on list/array/map cells
(`TypeError: unhashable type: 'list'`, the exact failure recorded
against docs_hashing_tf / multi_embed_media in CORRECTNESS_r02).

Runs the full registry at sf0.001 and applies the same ``driver_canon``
helper scripts/check_oracle.py uses, so a query with a driver-unsortable
output type fails locally the day it is written.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from check_oracle import driver_canon  # noqa: E402

from crawlers_spark import harness

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = harness.queries()


@pytest.mark.parametrize("name", list(_QUERIES))
def test_driver_canonicalizable(spark, name):
    pdf = _QUERIES[name](spark, SF_DIR).toPandas()
    canon = driver_canon(pdf)  # raises TypeError on unsortable cells
    assert len(canon) == len(pdf)
    # driver also hashes the sorted frame — every cell must be hashable
    for row in canon.head(20).itertuples(index=False, name=None):
        hash(row)
