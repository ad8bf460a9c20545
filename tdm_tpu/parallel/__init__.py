"""Device mesh + sharding rules (DP + FSDP over ('data','fsdp'))."""

from tdm_tpu.parallel import mesh  # noqa: F401
