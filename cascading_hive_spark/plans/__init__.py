from cascading_hive_spark.plans.explain import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema,
    physical_plan,
)
