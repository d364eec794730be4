"""
parallel
========

Multi-chip / multi-host scaling via jax.sharding.Mesh + shard_map:
frame-batch data parallelism and spatial tiling with halo exchange.

The reference's only parallelism is a CPU thread pool over image rows
(/root/reference/simplestereo/_passive.cpp:351-396); on TPU that role is
played by the XLA grid within a chip and by sharded meshes across chips.
"""
