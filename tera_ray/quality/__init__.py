from .checks import (  # noqa: F401
    Check,
    approx_distinct,
    approx_foreign_key,
    approx_unique,
    foreign_key,
    histogram_psi,
    in_range,
    in_set,
    matches,
    not_null,
    run_checks,
    unique,
)
