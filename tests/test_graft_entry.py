"""Driver-contract guards for __graft_entry__.py.

The driver runs entry() (single-chip compile check) and dryrun_multichip(n)
(virtual-mesh TDM step) — the full execution is exercised by the driver
itself (and by scripts/check_multichip.sh pre-snapshot); these tests pin the
cheap invariants a refactor could silently break:

  * the tunnel-proof subprocess environment — a down axon tunnel must never
    be dialed (docs/ENVIRONMENT_NOTES.md #17), and every variant child gets
    the CPU platform + virtual devices + raised collective-rendezvous
    windows (the round-4 MULTICHIP regression was a 40 s rendezvous window
    expiring on a 1-core host);
  * failure isolation — one crashing variant must not erase the other
    variants' evidence (round-4: a single SIGABRT swallowed six passing
    variants and the driver tail showed only the crash);
  * entry()'s jittability on the test CPU.
"""

import subprocess
import types

import jax
import pytest

import __graft_entry__ as graft


def test_dryrun_subprocess_is_tunnel_proof(monkeypatch):
    """Under an ambient axon tunnel, dryrun_multichip must not enumerate
    devices in-process, and every per-variant CPU child must get an
    environment that cannot dial the tunnel."""
    captured = []

    def fake_run(cmd, env=None, cwd=None, capture_output=False, text=False,
                 timeout=None):
        captured.append((list(cmd), dict(env)))
        return types.SimpleNamespace(
            returncode=0, stdout=f"dryrun {cmd[-1]} ok: fake\n", stderr=""
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    # simulate the bench host: the pool-IP env var is what makes
    # sitecustomize register the axon plugin
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    graft.dryrun_multichip(8)

    assert len(captured) == len(graft._VARIANTS)
    assert [cmd[-1] for cmd, _ in captured] == list(graft._VARIANTS)
    for cmd, env in captured:
        assert env["JAX_PLATFORMS"] == "cpu"
        assert "PALLAS_AXON_POOL_IPS" not in env
        assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
        for flag in graft._CPU_RENDEZVOUS_FLAGS:
            assert flag in env["XLA_FLAGS"]
        assert cmd[-2] == "8"  # child gets the device count


def test_dryrun_failure_isolation(monkeypatch, capsys):
    """A forced failure in ONE variant still yields a tail naming every
    pass plus the failure, and the raised error carries both lists — the
    driver's 4KB tail must always show the full per-variant verdict."""
    bad = graft._VARIANTS[2]

    def fake(variant, n_devices):
        if variant == bad:
            return False, 1.0, "[fake SIGABRT tail]"
        return True, 1.0, f"dryrun {variant} ok: fake-evidence"

    monkeypatch.setattr(graft, "run_variant_subprocess", fake)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    with pytest.raises(RuntimeError) as ei:
        graft.dryrun_multichip(8)

    out = capsys.readouterr().out
    summary = out[out.index("dryrun_multichip summary"):]
    for v in graft._VARIANTS:
        if v == bad:
            assert f"dryrun {v} FAILED" in summary
        else:
            assert f"dryrun {v} ok" in summary
    n = len(graft._VARIANTS)
    assert f"{n - 1}/{n} variants ok" in summary
    msg = str(ei.value)
    assert bad in msg and f"1/{n}" in msg and "passing:" in msg


def test_entry_returns_jittable_forward():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim >= 3  # a latent batch
    assert jax.numpy.isfinite(out.astype(jax.numpy.float32)).all()
