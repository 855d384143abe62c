from simple_tsdb_spark.plans.analytics import (
    pricing_summary,
    revenue_by_nation,
    top_customers_per_nation,
    daily_event_pivot,
    revenue_rollup,
    forecast_revenue,
    large_volume_customers,
    min_cost_parts,
    nation_balance_share,
    revenue_cube,
    order_priority_counts,
    event_transitions,
)

__all__ = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers_per_nation",
    "daily_event_pivot",
    "revenue_rollup",
    "forecast_revenue",
    "large_volume_customers",
    "min_cost_parts",
    "nation_balance_share",
    "revenue_cube",
    "order_priority_counts",
    "event_transitions",
]
