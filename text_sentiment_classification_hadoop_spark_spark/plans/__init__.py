from .explain import assert_broadcast_join, assert_no_exchange, assert_pushed_filters, plan_string  # noqa: F401
