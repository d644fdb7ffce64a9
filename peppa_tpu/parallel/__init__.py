from peppa_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree, param_shardings

__all__ = ["make_mesh", "shard_batch", "replicate_tree", "param_shardings"]
