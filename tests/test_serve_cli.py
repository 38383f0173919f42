"""tools/serve.py --cpu-mesh: the env mutations must land BEFORE any jax
import (ADVICE r3: apply_platform_env()/enable_compilation_cache() used to
import jax first, so --cpu-mesh's XLA_FLAGS/JAX_PLATFORMS were ignored and
the demo landed on the busy TPU)."""
import json
import os
import subprocess
import sys


def test_serve_cpu_mesh_forces_virtual_devices(tmp_path):
    env = {**os.environ, "CDFO_JAX_CACHE": str(tmp_path / "cache")}
    # deliberately strip the suite's own CPU pinning: serve.py must set it
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "tools/serve.py", "--cpu-mesh", "4", "--frames",
         "4", "--height", "64", "--width", "96", "--k-per-device", "1"],
        capture_output=True, text=True, timeout=1800, env=env)
    assert out.returncode == 0, out.stderr[-800:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    info = json.loads(lines[-1])
    assert info["devices"] == 4
    assert info["mode"].startswith("sharded over 4 devices")
    assert info["frames"] == 4
