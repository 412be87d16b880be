"""Two-run (warmup + measured) e2e diagnosis with per-dispatch wall-time
instrumentation: explains BASELINE_E2E's loop_seconds dispatch by dispatch."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from hpmvs_tpu import config
    from hpmvs_tpu.runtime import pipeline
    from hpmvs_tpu.runtime import wavefront

    times = []   # (tag, seconds)

    orig_dispatch = wavefront.Engine._dispatch_extend
    orig_fetch = wavefront.Engine._fetch

    def timed_dispatch(self, *a):
        t0 = time.time()
        r = orig_dispatch(self, *a)
        times.append(("dispatch_enqueue", time.time() - t0, a[0].shape[0]))
        return r

    def timed_fetch(self, res):
        t0 = time.time()
        r = orig_fetch(self, res)
        times.append(("fetch", time.time() - t0, 0))
        return r

    wavefront.Engine._dispatch_extend = timed_dispatch
    wavefront.Engine._fetch = timed_fetch

    sdir = "/tmp/hpmvs_scenes/plane"
    opt = config.Options(OUTFOLDER=os.path.join(sdir, "tpu_diag"))

    for run in range(2):
        times.clear()
        t0 = time.time()
        eng = pipeline.run_nvm_file(os.path.join(sdir, "scene.nvm"), opt)
        wall = time.time() - t0
        enq = [t for tag, t, _ in times if tag == "dispatch_enqueue"]
        fet = [t for tag, t, _ in times if tag == "fetch"]
        out = {
            "run": run,
            "wall": round(wall, 1),
            "loop": round(float(eng.stats["proc_time"]), 1),
            "t_device": round(float(eng.stats["t_device"]), 1),
            "dispatches": int(eng.stats["dispatches"]),
            "enqueue_total_s": round(sum(enq), 1),
            "enqueue_max_s": round(max(enq), 2) if enq else 0,
            "enqueue_over_1s": sum(1 for t in enq if t > 1.0),
            "fetch_total_s": round(sum(fet), 1),
            "fetch_max_s": round(max(fet), 2) if fet else 0,
            "fetch_over_1s": sum(1 for t in fet if t > 1.0),
            "n_fetch": len(fet),
            "t_phase0": round(float(eng.stats["t_phase0"]), 1),
            "t_phase2": round(float(eng.stats["t_phase2"]), 1),
        }
        print(json.dumps(out))
        with open(f"/tmp/diag_e2e2_run{run}.json", "w") as fh:
            json.dump(out, fh)


if __name__ == "__main__":
    main()
