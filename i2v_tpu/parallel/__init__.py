"""Mesh / sharding / collectives layer.

The reference has no distributed backend — its only parallelism is manual
``--batch_nums/--batch_index`` index sharding across processes
(image_main.py:18-19,61-63; SURVEY.md §2). The TPU-native equivalents here:

  - :mod:`mesh`      — device mesh construction + clip/frame shardings
  - :mod:`sharded`   — pjit-sharded attack steps (dp over clips, sp over the
                       flattened frame axis)
  - :mod:`dist`      — multi-host initialization + per-process sample
                       sharding over DCN (the --batch_index replacement)
"""

from .mesh import attack_mesh, clip_sharding, frame_sharding, shard_clips  # noqa: F401
