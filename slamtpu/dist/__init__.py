from .sharded import build_map_sharded, lo_train_step, make_mesh, newton_align_sharded

__all__ = ["make_mesh", "build_map_sharded", "newton_align_sharded", "lo_train_step"]
