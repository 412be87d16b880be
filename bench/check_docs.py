"""Docs == artifacts, mechanically (r4 verdict item 7).

Every headline number quoted in README.md / SCALING.md must be derivable
from a committed JSON artifact; this checker recomputes the expected strings
from the artifacts and asserts each appears verbatim in the named doc, so
any re-measurement that is not propagated into the prose fails loudly
(tests/test_docs.py runs this in the suite).

Convention: docs cite their artifact by name next to the number (e.g.
"`BENCH_r04.json`"); checks pin to that SPECIFIC artifact, so a future
round's new artifact cannot silently invalidate older, correctly-labelled
claims.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    with open(os.path.join(ROOT, name)) as fh:
        return json.load(fh)


def expected_strings():
    """[(doc, must_contain, why)]"""
    out = []
    e2e = _load("BASELINE_E2E.json")
    pl, fa = e2e["plane"], e2e["facade"]

    def e2e_cpu(s):
        return s["cpu"]["init_seconds"] + s["cpu"]["loop_seconds"]

    # SCALING §6 table rows (computed from BASELINE_E2E.json)
    out.append(("SCALING.md",
                "| plane 512px / 7 cams | %.1f s | **%.1f s (%.1f s loop)** "
                "| **%.2fx** |" % (e2e_cpu(pl), pl["tpu"]["wall_seconds"],
                                   pl["tpu"]["loop_seconds"],
                                   pl["speedup_e2e"]),
                "plane e2e row vs BASELINE_E2E.json"))
    out.append(("SCALING.md",
                "| facade 256px / 11 cams | %.1f s | **%.1f s (%.2f s loop)**"
                " | **%.2fx** |" % (e2e_cpu(fa), fa["tpu"]["wall_seconds"],
                                    fa["tpu"]["loop_seconds"],
                                    fa["speedup_e2e"]),
                "facade e2e row vs BASELINE_E2E.json"))
    out.append(("README.md",
                "| end-to-end wall (init + loop) | %.1f s | **%.1f s "
                "(%.2fx)** |" % (e2e_cpu(pl), pl["tpu"]["wall_seconds"],
                                 pl["speedup_e2e"]),
                "plane e2e README row vs BASELINE_E2E.json"))
    out.append(("README.md",
                "%.2fx end-to-end (loop %.2f s vs %.2f s)"
                % (fa["speedup_e2e"], fa["tpu"]["loop_seconds"],
                   fa["cpu"]["loop_seconds"]),
                "facade e2e README claim vs BASELINE_E2E.json"))

    # BENCH_rNN-labelled claims: whichever rounds the docs cite must match
    # that round's artifact. Currently cited: r04.
    b = _load("BENCH_r04.json")["parsed"]
    kern = "%.1fk patches/s" % (b["value"] / 1000.0)
    out.append(("README.md", "**%s, %.1fx**" % (kern, b["vs_baseline"]),
                "kernel rate vs BENCH_r04.json"))
    out.append(("SCALING.md", "**%s**" % kern,
                "kernel rate vs BENCH_r04.json"))
    pps = b["extra"]["pipeline_patches_per_sec"]
    out.append(("README.md", "**%.1fk patches/s" % (pps / 1000.0),
                "pipeline rate vs BENCH_r04.json"))
    out.append(("SCALING.md", "**%.1fk patches/s**" % (pps / 1000.0),
                "pipeline rate vs BENCH_r04.json"))

    # round-5 real-chip stress rows (README) vs bench/stress.json
    st = _load("bench/stress.json")
    ring, mp = st["ring_150cam_tpu"], st["megapixel_facade_tpu"]
    out.append(("README.md",
                "**%.1f s** (vs %.1f s same engine on the 2-core CPU mesh)"
                % (ring["wall_s"], st["ring_150cam"]["wall_s"]),
                "ring chip wall vs stress.json"))
    out.append(("README.md", "| {:,} |".format(ring["alive"]),
                "ring alive vs stress.json"))
    out.append(("README.md",
                "inlier **%.4f @4·GSD**, **%.3f @2%%**"
                % (ring["inlier_frac_4gsd"], ring["inlier_frac_2pct"]),
                "ring quality vs stress.json"))
    out.append(("README.md",
                "**%.1f s** (vs %.1f s CPU-mesh)"
                % (mp["wall_s"], st["megapixel_facade"]["wall_s"]),
                "megapixel chip wall vs stress.json"))
    out.append(("README.md",
                "inlier **%.3f @2%%**, median err **%.2f GSD**"
                % (mp["inlier_frac_2pct"], mp["median_err_gsd"]),
                "megapixel quality vs stress.json"))
    ta = mp["tail_attribution"]
    out.append(("README.md",
                "**%.1f%% near the ridge**" %
                (ta["outlier_frac_nearridge"] * 100),
                "tail nearridge vs stress.json"))
    out.append(("README.md",
                "**%.1f%% on the outer faces**" %
                (ta["outlier_frac_outer"] * 100),
                "tail outer vs stress.json"))
    out.append(("README.md",
                "**%.1f%% at the vertical extremes**" %
                (ta["outlier_frac_y_extreme"] * 100),
                "tail y-extreme vs stress.json"))
    out.append(("README.md",
                "median %.1f° off ground truth vs %.1f°"
                % (ta["normal_err_deg_median_outlier"],
                   ta["normal_err_deg_median_inlier"]),
                "tail normal err vs stress.json"))

    # round-5 progressive head-to-head rows (README) vs bench/progressive.json
    pg = _load("bench/progressive.json")
    tpu, cpu = pg["tpu"], pg["cpu"]
    out.append(("README.md",
                "| run completes | %.1f s | **%.1f s (%.1fx)** |"
                % (cpu["wall_s"], tpu["wall_s"],
                   cpu["wall_s"] / tpu["wall_s"]),
                "progressive completion walls vs progressive.json"))
    gain = 100.0 * tpu["final"]["patches"] / cpu["final"]["patches"] - 100.0
    out.append(("README.md",
                "| final patches | {:,} | **{:,} (+{:.0f}%) ** |".format(
                    cpu["final"]["patches"], tpu["final"]["patches"],
                    gain).replace(") *", ")*"),
                "progressive final patches vs progressive.json"))
    out.append(("README.md",
                "| final inlier @4·GSD | %.4f | **%.4f** |"
                % (cpu["final"]["inlier_frac_4gsd"],
                   tpu["final"]["inlier_frac_4gsd"]),
                "progressive inlier vs progressive.json"))
    out.append(("README.md",
                "| patches @120 s budget | {:,} (snapshot landed at {:.1f} s)"
                " | **{:,} (already complete)** |".format(
                    cpu["snapshots"][0]["patches"],
                    cpu["snapshots"][0]["elapsed_s"],
                    tpu["snapshots"][0]["patches"]),
                "progressive 120s snapshot vs progressive.json"))

    # SCALING section-3 measured inputs vs bench/scaling_inputs.json
    si = _load("bench/scaling_inputs.json")
    d2048 = [r for r in si["dispatch"]["dispatch_curve"]
             if r["B"] == 2048][0]
    out.append(("SCALING.md",
                "%.2f µs/lane on chip" % d2048["us_per_lane_pipelined"],
                "per-lane pipelined vs scaling_inputs.json"))
    out.append(("SCALING.md",
                "%.1f ms measured (serial − pipelined, B=2048)"
                % d2048["overhead_ms"],
                "dispatch overhead vs scaling_inputs.json"))
    h = si["host_16k"]
    out.append(("SCALING.md",
                "%.1f ms total (%.2f µs/lane)"
                % ((h["winner_sim_s"] + h["insert_s"]) * 1e3,
                   h["us_per_lane"]),
                "16k router cost vs scaling_inputs.json"))
    return out


def main():
    docs = {}
    failures = []
    for doc, needle, why in expected_strings():
        if doc not in docs:
            with open(os.path.join(ROOT, doc)) as fh:
                docs[doc] = fh.read()
        if needle not in docs[doc]:
            failures.append((doc, needle, why))
    for doc, needle, why in failures:
        print("DRIFT %s: expected %r (%s)" % (doc, needle, why))
    if failures:
        sys.exit(1)
    print("docs match artifacts (%d checks)" % len(expected_strings()))


if __name__ == "__main__":
    main()
