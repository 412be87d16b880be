"""Diagnose the end-to-end TPU loop: per-phase timings, dispatch counts,
time/dispatch — the numbers behind BASELINE_E2E's loop_seconds. Writes
/tmp/diag_e2e.json."""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO)


def main():
    from hpmvs_tpu import config
    from hpmvs_tpu.runtime import pipeline

    sdir = "/tmp/hpmvs_scenes/plane"
    outdir = os.path.join(sdir, "tpu_diag")
    opt = config.Options(OUTFOLDER=outdir)
    t0 = time.time()
    eng = pipeline.run_nvm_file(os.path.join(sdir, "scene.nvm"), opt)
    wall = time.time() - t0
    st = {k: (float(v) if isinstance(v, float) else int(v))
          for k, v in eng.stats.items()}
    st["wall_seconds"] = wall
    st["final_patches"] = eng.n_alive()
    with open("/tmp/diag_e2e.json", "w") as fh:
        json.dump(st, fh, indent=2)
    print(json.dumps(st, indent=2))


if __name__ == "__main__":
    main()
