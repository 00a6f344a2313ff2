from hsg_tpu.parallel.mesh import create_mesh, shard_batch, replicate
