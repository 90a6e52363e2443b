from .cleaning import (  # noqa: F401
    bucketize,
    coerce_numeric,
    const_fill,
    dict_encode,
    eq_flag,
    median_fill,
    membership_flag,
    normalize_string,
    segment3,
    to_flag,
)
