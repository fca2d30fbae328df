"""Generate the comparison figures the reference commits but round 1 lacked
(VERDICT r1 missing #4 / next-step #9):

* results/figures/throughput_comparison.png — framework vs reference CPU
  baselines (reference ``benchmarks/throughput_test.py:100-182``)
* results/figures/complexity_comparison.png — closed-form op counts
  (reference ``complexity_analysis.py`` outputs)
* results/sc_scl_comparison/speed_accuracy.png — FER vs latency per
  decoder (the reference's 5-figure SCL report's tradeoff panel,
  ``sc_vs_scl.py:352-531``)

Pure host-side matplotlib (Agg) from committed JSONs.
Run: python tools/make_figures.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = Path(__file__).resolve().parent.parent
# Okabe–Ito colorblind-safe palette, fixed assignment (never cycled)
C_FRAMEWORK = "#0072B2"   # blue — this framework (TPU)
C_REFERENCE = "#E69F00"   # orange — reference (CPU)
C_POLAR = "#009E73"
C_LDPC = "#D55E00"


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def throughput_comparison() -> Path:
    plt = _plt()
    ours = json.loads((ROOT / "results/data/throughput_results.json").read_text())
    # reference committed numbers (BASELINE.md →
    # benchmarks/results/data/throughput_results.json)
    ref = {"Polar encode": 0.0307, "Polar SC decode": 0.00398,
           "LDPC encode": 0.00197, "LDPC BP decode": 7.95e-5}
    mine = {"Polar encode": ours["polar"]["encoding_throughput"],
            "Polar SC decode": ours["polar"]["decoding_throughput"],
            "LDPC encode": ours["ldpc"]["encoding_throughput"],
            "LDPC BP decode": ours["ldpc"]["decoding_throughput"]}
    labels = list(ref)
    x = range(len(labels))
    w = 0.38
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.bar([i - w / 2 for i in x], [ref[k] for k in labels], w,
           label="reference (CPU, committed)", color=C_REFERENCE)
    ax.bar([i + w / 2 for i in x], [mine[k] for k in labels], w,
           label="this framework", color=C_FRAMEWORK)
    ax.set_yscale("log")
    ax.set_ylabel("throughput (Mbps)")
    ax.set_xticks(list(x), labels, rotation=15)
    ax.set_title("Throughput: framework vs reference baselines "
                 "(N=1024 polar, n=504 LDPC)")
    for i, k in enumerate(labels):
        ax.text(i + w / 2, mine[k] * 1.15, f"{mine[k] / ref[k]:,.0f}×",
                ha="center", fontsize=9)
    ax.set_ylim(top=max(mine.values()) * 300)  # headroom for the legend
    ax.legend()
    ax.grid(axis="y", alpha=0.3)
    out = ROOT / "results/figures/throughput_comparison.png"
    fig.tight_layout()
    fig.savefig(out, dpi=300)
    plt.close(fig)
    return out


def complexity_comparison() -> Path:
    plt = _plt()
    d = json.loads((ROOT / "results/data/complexity_results.json").read_text())
    p, l = d["polar"], d["ldpc"]
    items = [
        ("Polar encode", p["encoding"]["xor_operations"], C_POLAR),
        ("Polar SC", p["sc_decoding"]["operations"], C_POLAR),
        (f"Polar SCL-{p['list_size']}", p["scl_decoding"]["operations"], C_POLAR),
        ("LDPC encode", l["encoding"]["operations"], C_LDPC),
        (f"LDPC BP ({l['max_iterations']} it)", l["bp_decoding"]["operations"],
         C_LDPC),
    ]
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.bar(range(len(items)), [v for _, v, _ in items],
           color=[c for _, _, c in items], width=0.6)
    ax.set_yscale("log")
    ax.set_ylabel("operations per frame (closed form)")
    ax.set_xticks(range(len(items)), [k for k, _, _ in items], rotation=15)
    ax.set_title(f"Per-frame complexity (polar N={p['N']}, LDPC n={l['n']})")
    for i, (_, v, _) in enumerate(items):
        ax.text(i, v * 1.15, f"{v:,}", ha="center", fontsize=9)
    ax.grid(axis="y", alpha=0.3)
    out = ROOT / "results/figures/complexity_comparison.png"
    fig.tight_layout()
    fig.savefig(out, dpi=300)
    plt.close(fig)
    return out


def speed_accuracy_tradeoff(snr_pick: float = -1.0) -> Path:
    plt = _plt()
    d = json.loads((ROOT / "results/sc_scl_comparison/results.json").read_text())
    lat = d["latency_ms_per_frame"]
    snrs = d["snr_db"]
    idx = min(range(len(snrs)), key=lambda i: abs(snrs[i] - snr_pick))
    pts = []
    for name, curve in d["curves"].items():
        key = "sc" if name == "sc" else name.split("_")[1]
        if key in lat:
            fer = curve["fer"][idx]
            pts.append((name.upper().replace("_", "-"), lat[key], fer))
    fig, ax = plt.subplots(figsize=(8, 5))
    xs = [p[1] for p in pts]
    ys = [max(p[2], 1e-4) for p in pts]  # zero-FER floor for the log axis
    ax.plot(xs, ys, "o", color=C_FRAMEWORK, markersize=9)
    for name, x, y in pts:
        ax.annotate(name, (x, max(y, 1e-4)),
                    textcoords="offset points", xytext=(6, 6), fontsize=9)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("decode latency (ms/frame)")
    ax.set_ylabel(f"FER @ {snrs[idx]:g} dB (1e-4 floor = no errors observed)")
    ax.set_title(f"Speed–accuracy tradeoff, N={d['N']} K={d['K']}")
    ax.grid(alpha=0.3, which="both")
    out = ROOT / "results/sc_scl_comparison/speed_accuracy.png"
    fig.tight_layout()
    fig.savefig(out, dpi=300)
    plt.close(fig)
    return out


def improvement_comparison() -> Path:
    """The reference SCL report's list-size improvement panel
    (``sc_vs_scl.py:453-485``), regenerated from the committed study —
    the fifth and final figure of that report set."""
    import polarcode_and_ldpc_tpu  # noqa: F401 — path setup
    from polarcode_and_ldpc_tpu.cli.sc_vs_scl import plot_improvement_summary

    d = json.loads((ROOT / "results/sc_scl_comparison/results.json").read_text())
    out = ROOT / "results/sc_scl_comparison/improvement_comparison.png"
    plot_improvement_summary(d, out)
    return out


def main() -> None:
    for fn in (throughput_comparison, complexity_comparison,
               speed_accuracy_tradeoff, improvement_comparison):
        print("wrote", fn())


if __name__ == "__main__":
    main()
