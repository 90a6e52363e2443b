from .aggregates import (  # noqa: F401
    domain_values,
    exact_median,
    group_avg,
    histogram,
    null_counts,
    pct_of_total,
    pivot_counts,
    value_counts,
)
