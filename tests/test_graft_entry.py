"""Driver-contract guards for __graft_entry__.py.

The driver runs entry() (single-chip compile check) and dryrun_multichip(n)
(virtual-mesh TDM step) — the full execution is exercised by the driver
itself; these tests pin the cheap invariants a refactor could silently
break: the tunnel-proof subprocess environment (a down axon tunnel must
never be dialed — see docs/ENVIRONMENT_NOTES.md #17) and entry()'s
jittability on the test CPU.
"""

import subprocess

import jax

import __graft_entry__ as graft


def test_dryrun_subprocess_is_tunnel_proof(monkeypatch):
    """Under an ambient axon tunnel, dryrun_multichip must not enumerate
    devices in-process, and its CPU child must get an environment that
    cannot dial the tunnel."""
    captured = {}

    def fake_run(cmd, env=None, cwd=None):
        captured["cmd"], captured["env"] = cmd, env

        class P:
            returncode = 0

        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    # simulate the bench host: the pool-IP env var is what makes
    # sitecustomize register the axon plugin
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    graft.dryrun_multichip(8)

    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert captured["cmd"][-1] == "8"  # child gets the device count


def test_entry_returns_jittable_forward():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim >= 3  # a latent batch
    assert jax.numpy.isfinite(out.astype(jax.numpy.float32)).all()
