from binaryvectordb_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    plan_has,
)
