from .explain import assert_broadcast_join, assert_pushed_filters, plan_string

__all__ = ["plan_string", "assert_pushed_filters", "assert_broadcast_join"]
