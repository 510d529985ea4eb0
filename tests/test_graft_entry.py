"""Driver-entry contract tests: __graft_entry__.dryrun_multichip must work
both with enough devices in-process AND on an under-provisioned host (one
real chip) by self-provisioning a virtual CPU mesh in a subprocess — the
round-1 driver failure mode (VERDICT.md item 1)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_process():
    # conftest provisions 8 virtual CPU devices, so this takes the direct path
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_when_underprovisioned():
    # Parent: 2 CPU devices. dryrun_multichip(4) must detect the shortfall
    # and delegate to a 4-device virtual-CPU subprocess instead of raising.
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as g\n"
        "assert len(jax.devices()) == 2\n"
        "g.dryrun_multichip(4)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, f"stderr:\n{out.stderr}\nstdout:\n{out.stdout}"
    assert "dryrun_multichip(4)" in out.stdout
