from .explain import physical_plan, count_exchanges, has_broadcast_join, pushed_filters

__all__ = ["physical_plan", "count_exchanges", "has_broadcast_join", "pushed_filters"]
