#!/usr/bin/env python
"""Produce SCALING_r5.json: the data-parallel scaling-mechanics artifact
(VERDICT r4 item 6; BASELINE.md >=80%-efficiency north star).

Two sections:
  * ``single_process``: the bench-scaling weak-scaling ladder on an
    8-virtual-CPU-device mesh (``bench/scaling_bench.py``).  Virtual
    devices share physical cores, so the efficiency column is a
    MECHANICS baseline (platform-labeled), not a hardware claim -- on
    real multi-chip hardware the same command produces the north-star
    measurement.
  * ``multihost``: the 2-process Gloo path (``parallel/multihost.py``):
    each process times its shard of a global 2x2-device pairs mesh; the
    artifact records the achieved global rate next to a single-process
    4-device rate on the same problem, so cross-process overhead has a
    measured baseline.

Run from the repo root:  python examples/make_scaling_artifact.py
"""

import json
import os
import re
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import sys, time, json
pid, nproc, port, repo = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
sys.path.insert(0, repo)
from se3_icp_tpu.parallel import multihost
multihost.initialize(f"127.0.0.1:{port}", nproc, pid, cpu_devices_per_process=2)
import numpy as np
from se3_icp_tpu.datasets import synthetic
from se3_icp_tpu.utils.config import GOLDEN
cfg = GOLDEN.replace(number_of_nn_for_lrf=30)
per_proc = 4
prob = synthetic.golden_like_problem(seed=7)
rng = np.random.default_rng(pid)
def local_pairs():
    return [(prob.source + rng.normal(scale=1e-4, size=prob.source.shape),
             prob.target) for _ in range(per_proc)]
multihost.register_pairs_multihost(local_pairs(), "se3_pt2pl", cfg)  # warm
reps = 3
times = []
for _ in range(reps):
    t0 = time.time()
    multihost.register_pairs_multihost(local_pairs(), "se3_pt2pl", cfg)
    times.append(time.time() - t0)
rate = nproc * per_proc / float(np.median(times))
print(f"MHRATE{pid}:" + json.dumps({"global_pairs_per_s": rate,
                                    "per_proc_pairs": per_proc}), flush=True)
"""


def single_process_section():
    r = subprocess.run(
        [sys.executable, "-c", (
            "import sys, json\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "import os\n"
            "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS','')"
            " + ' --xla_force_host_platform_device_count=8')\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from se3_icp_tpu.bench import scaling_bench\n"
            "rep = scaling_bench.run_scaling(per_device=2, reps=3,"
            " cloud='golden')\n"
            "print('SPREP:' + json.dumps(rep))\n")],
        capture_output=True, text=True, timeout=3600)
    m = re.search(r"SPREP:(\{.*\})", r.stdout)
    assert m, (r.stdout[-2000:], r.stderr[-2000:])
    return json.loads(m.group(1))


def single_process_4dev_rate():
    """1-process 4-device rate on the multihost section's problem, for
    the cross-process overhead comparison."""
    r = subprocess.run(
        [sys.executable, "-c", (
            "import sys, json, time\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "import os\n"
            "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS','')"
            " + ' --xla_force_host_platform_device_count=4')\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import numpy as np\n"
            "from se3_icp_tpu.datasets import synthetic\n"
            "from se3_icp_tpu.parallel import pairs as par\n"
            "from se3_icp_tpu.utils.config import GOLDEN\n"
            "cfg = GOLDEN.replace(number_of_nn_for_lrf=30)\n"
            "prob = synthetic.golden_like_problem(seed=7)\n"
            "rng = np.random.default_rng(0)\n"
            "def lists():\n"
            "    return [(prob.source + rng.normal(scale=1e-4,"
            " size=prob.source.shape), prob.target) for _ in range(8)]\n"
            "mesh = par.default_mesh()\n"
            "par.register_pairs(lists(), 'se3_pt2pl', cfg, mesh=mesh)\n"
            "times = []\n"
            "for _ in range(3):\n"
            "    t0 = time.time()\n"
            "    par.register_pairs(lists(), 'se3_pt2pl', cfg, mesh=mesh)\n"
            "    times.append(time.time() - t0)\n"
            "print('SP4:' + json.dumps(8 / float(np.median(times))))\n")],
        capture_output=True, text=True, timeout=3600)
    m = re.search(r"SP4:([0-9.eE+-]+)", r.stdout)
    assert m, (r.stdout[-2000:], r.stderr[-2000:])
    return float(m.group(1))


def multihost_section():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = str(s.getsockname()[1])
    s.close()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), "2", port, REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    rates = {}
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        assert p.returncode == 0, out[-3000:]
        m = re.search(r"MHRATE(\d):(\{.*\})", out)
        assert m, out[-3000:]
        rates[m.group(1)] = json.loads(m.group(2))
    sp4 = single_process_4dev_rate()
    mh = rates["0"]["global_pairs_per_s"]
    return {
        "processes": 2,
        "devices_per_process": 2,
        "backend": "gloo (cpu)",
        "global_pairs_per_s": round(mh, 3),
        "single_process_4dev_pairs_per_s": round(sp4, 3),
        "cross_process_ratio": round(mh / sp4, 4),
        "note": ("2 OS processes share one physical core here; the "
                 "ratio measures Gloo/mesh mechanics overhead, not "
                 "hardware scaling"),
    }


def main():
    t0 = time.time()
    out = {
        "round": 5,
        "date": "2026-08-20",
        "purpose": ("scaling-mechanics baseline on virtual CPU devices; "
                    "rerun unchanged on real multi-chip hardware for "
                    "the >=80% north-star measurement (BASELINE.md)"),
        "single_process": single_process_section(),
        "multihost": multihost_section(),
    }
    out["wall_s"] = round(time.time() - t0, 1)
    path = os.path.join(REPO, "SCALING_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
