from wbot_ray.stages.normalize import seeds_to_frontier, FRONTIER_SCHEMA
from wbot_ray.stages.fetch import make_assign_fetch_part, make_fetch_group_fn, make_fused_fetch_fn
from wbot_ray.stages.explode import make_explode_fn
from wbot_ray.stages.dedup import make_dedup_fn
from wbot_ray.stages.order import assign_crawl_ord

__all__ = [
    "seeds_to_frontier",
    "FRONTIER_SCHEMA",
    "make_assign_fetch_part",
    "make_fetch_group_fn",
    "make_fused_fetch_fn",
    "make_explode_fn",
    "make_dedup_fn",
    "assign_crawl_ord",
]
