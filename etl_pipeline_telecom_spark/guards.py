"""Input-size guards for the deliberately-quadratic baseline operators.

v1_knn_brute and d7_ngram_jaccard_pairs exist as correctness baselines
for the bucketed/indexed scale paths (v5/v7, d5/d12). Their cost is
quadratic by construction, which is fine at their documented sizes and a
cluster-killer if a caller points them at a full 100 TB corpus — so the
builders refuse oversized inputs at plan-construction time instead of
discovering the blow-up mid-job (VERDICT r3 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def assert_bounded_input(df: DataFrame, max_rows: int, what: str) -> None:
    """Raise if ``df`` has more than ``max_rows`` rows.

    The check runs ``limit(max_rows + 1).count()`` — it touches at most
    ``max_rows + 1`` rows regardless of input size (the scan stops at the
    limit), so the guard itself is safe to run on a table of any size.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what}: input exceeds the {max_rows}-row bound for this "
            "quadratic baseline — use the bucketed/indexed variant "
            "(v5/v7 for similarity, d5/d12 for dedup) on full-size data"
        )
