"""Physical-plan inspection (SURVEY.md §4): helpers to assert the
plans we *want* — pushdown reaching the scan, broadcasts where dims
are small, rank-limit pushdown on top-k — not just plans that pass."""

from .inspect import (  # noqa: F401
    assert_plan_contains,
    assert_plan_lacks,
    plan_string,
)

__all__ = ["assert_plan_contains", "assert_plan_lacks", "plan_string"]
