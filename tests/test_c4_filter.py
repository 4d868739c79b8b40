"""C4 line-filter hand cases (functions/textstats.py c4_line_filter)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import c4_line_filter

GOOD = "This is a good sentence with enough words."
CASES = [
    # (text, kept, n_lines_kept, clean_text)
    (f"{GOOD}\n{GOOD}\n{GOOD}", True, 3, f"{GOOD}\n{GOOD}\n{GOOD}"),
    (f"{GOOD}\n{GOOD}", False, 2, f"{GOOD}\n{GOOD}"),        # <3 lines
    (f"{GOOD}\nno punct line with many words here\n{GOOD}\n{GOOD}",
     True, 3, f"{GOOD}\n{GOOD}\n{GOOD}"),                    # punct rule
    (f"{GOOD}\nShort line.\n{GOOD}\n{GOOD}", True, 3,
     f"{GOOD}\n{GOOD}\n{GOOD}"),                             # 5-word rule
    (f"{GOOD}\nEnable JavaScript to view this page now.\n{GOOD}\n{GOOD}",
     True, 3, f"{GOOD}\n{GOOD}\n{GOOD}"),                    # javascript rule
    (f"{GOOD}\n{GOOD}\n{GOOD}\nlorem ipsum filler text words here.",
     False, 4, None),                                        # lorem page drop
    (f"{GOOD}\n{GOOD}\n{GOOD}\nvar x = {{}} ;", False, 3, None),  # brace drop
    ('He said "stop right there my good friend!"', False, 1, None),  # quote ends line ok
    ("", False, 0, ""),
]


def test_c4_hand_cases(spark):
    rows = [(i, t) for i, (t, *_ ) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, text string")
    cols = c4_line_filter(F.col("text"))
    got = {
        r.i: (r.kept, r.n, r.clean)
        for r in df.select(
            "i", cols["kept"].alias("kept"), cols["n_lines_kept"].alias("n"),
            cols["clean_text"].alias("clean"),
        ).collect()
    }
    for i, (text, kept, n, clean) in enumerate(CASES):
        assert got[i][0] == kept, (i, text)
        assert got[i][1] == n, (i, text)
        if clean is not None:
            assert got[i][2] == clean, (i, text)
