from change_data_capture_spark.plans.inspect import (
    PlanStats,
    plan_stats,
)

__all__ = ["PlanStats", "plan_stats"]
