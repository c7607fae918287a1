from wbot_ray.state.seen import SeenSet
from wbot_ray.state.cuckoo import CuckooFilter

__all__ = ["SeenSet", "CuckooFilter"]
