"""Device mesh + sharding rules: DP + FSDP over ('data','fsdp'),
megatron-style tensor parallelism over ('data','tp') (parallel/tp.py), and
GPipe pipeline parallelism over the scan-stacked layer axis
(parallel/pp.py)."""

from tdm_tpu.parallel import mesh, pp, tp  # noqa: F401
