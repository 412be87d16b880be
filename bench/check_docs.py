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
