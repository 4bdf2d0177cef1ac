#!/usr/bin/env python3
"""Classify every large-sigma evidence disagreement between the TPU
sampler and the sequential C++ engine (VERDICT r3 item 4).

Inputs (committed artifacts):

* ``native_truth_seed5.json``  -- sequential-engine nlive=400 truth
  (validation/compute_native_truth.py), joint placement prior.
* ``tpu_agreement_seed5.json`` -- TPU sampler evidences on the same
  pixels (validation/tpu_agreement.py): nlive=100 multi-seed plus a
  truth-matched nlive=400 pass.

For every per-rung record with ``|dz|/sigma > 10`` (the bench's
outlier bound, bench.py native-truth gate) this writes a classified
postmortem to ``outlier_postmortem.md``:

* ``rung1-misfit-islands``: the rung-1 (1-component) model fits
  neither engine's data -- on strongly-2-component pixels its
  "posterior" is a set of far-separated noise-likelihood islands whose
  evidence both samplers can only localize to O(1e2-1e3) nats, while
  both still select nbest=2 by margins vastly above the 11-nat rule.
  Says nothing about evidence quality on models that FIT.
* ``tpu-undersampled-at-nlive100``: the TPU nlive=400 run agrees with
  the native nlive=400 truth, so the nlive=100 deviation is live-set
  resolution, not a sampler defect (MultiNest shows the same nlive
  sensitivity; see compute_native_truth.py docstring).
* ``baseline-seed-scatter``: the native engine's own across-seed
  scatter on this pixel exceeds the deviation -- the quoted
  sqrt(H/nlive) error understates its run-to-run variance.
* ``sampler-mode-loss``: the TPU median sits LOW of the native truth
  beyond all the above explanations -- a genuine failure; must be
  fixed, not explained.
* ``unexplained``: none of the above -- also a failure state.

Exits non-zero if any record lands in the last two classes.
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LNZ_THRESH = 11.0
OUTLIER_SIGMA = 10.0


def load():
    with open(os.path.join(HERE, "native_truth_seed5.json")) as fh:
        nat = json.load(fh)
    with open(os.path.join(HERE, "tpu_agreement_seed5.json")) as fh:
        tpu = json.load(fh)
    assert nat["cube_checksum"] == tpu["cube_checksum"], "cube mismatch"
    return nat, tpu


def main():
    nat, tpu = load()
    recs = nat["records"]

    # native baseline-error model: pooled across-seed scatter
    scat = {1: [], 2: []}
    for rec in recs.values():
        seeds = list(rec["seeds"].values())
        if len(seeds) >= 2:
            for n in (1, 2):
                scat[n].append(np.std([s[f"lnz{n}"] for s in seeds],
                                      ddof=1))
    s_model = {n: float(np.median(scat[n])) if scat[n] else 0.0
               for n in (1, 2)}

    t100 = [v for k, v in tpu["runs"].items() if k.startswith("nlive100")]
    t400 = [v for k, v in tpu["runs"].items() if k.startswith("nlive400")]

    rows, outliers = [], []
    for key, rec in sorted(recs.items(), key=lambda kv: int(kv[0])):
        i = key
        seeds = list(rec["seeds"].values())
        nat_med = {n: float(np.median([s[f"lnz{n}"] for s in seeds]))
                   for n in (1, 2)}
        nat_err = {n: float(np.median([s[f"lnz{n}_err"] for s in seeds]))
                   for n in (1, 2)}
        nat_scat = {
            n: (float(np.std([s[f"lnz{n}"] for s in seeds], ddof=1))
                if len(seeds) >= 2 else None)
            for n in (1, 2)
        }
        if not t100 or i not in t100[0]:
            continue
        null = t100[0][i]["null_lnz"]
        nat_nbest = 0 if nat_med[1] - null < LNZ_THRESH else (
            1 if nat_med[2] - nat_med[1] < LNZ_THRESH else 2)
        for n in (1, 2):
            tv = [r[i][f"lnz{n}"] for r in t100 if i in r]
            tpu_med = float(np.median(tv))
            tpu_scat = float(np.std(tv, ddof=1)) if len(tv) >= 2 else 0.0
            sig = max(float(np.sqrt(nat_err[n] ** 2 + s_model[n] ** 2)),
                      0.3)
            dz = (tpu_med - nat_med[n]) / sig
            tpu_med100 = [float(np.median([r[i]["lnz1"] for r in t100])),
                          float(np.median([r[i]["lnz2"] for r in t100]))]
            tpu_nbest = 0 if tpu_med100[0] - null < LNZ_THRESH else (
                1 if tpu_med100[1] - tpu_med100[0] < LNZ_THRESH else 2)
            t4v = [float(r[i][f"lnz{n}"]) for r in t400 if i in r]
            t4 = float(np.median(t4v)) if t4v else None
            row = {
                "pixel": int(i), "rung": n, "dz_sigma": dz,
                "tpu_med": tpu_med, "tpu_scat": tpu_scat,
                "nat_med": nat_med[n], "nat_err": nat_err[n],
                "nat_scat": nat_scat[n], "sigma": sig,
                "tpu_nlive400": t4,
                "tpu_nbest": tpu_nbest, "nat_nbest": nat_nbest,
                "truth": tpu["truth_params"].get(i),
            }
            rows.append(row)
            if abs(dz) <= OUTLIER_SIGMA:
                continue
            # ---- classification

            bf_tpu = tpu_med100[1] - tpu_med100[0]
            bf_nat = nat_med[2] - nat_med[1]
            if (n == 1 and tpu_nbest == nat_nbest == 2
                    and bf_tpu > 3 * LNZ_THRESH
                    and bf_nat > 3 * LNZ_THRESH):
                cls = "rung1-misfit-islands"
            elif t4 is not None and abs(t4 - nat_med[n]) < 3 * sig:
                cls = "tpu-undersampled-at-nlive100"
            elif (nat_scat[n] is not None
                  and abs(tpu_med - nat_med[n]) < 3 * nat_scat[n]):
                cls = "baseline-seed-scatter"
            elif tpu_med < nat_med[n]:
                cls = "sampler-mode-loss"
            else:
                cls = "unexplained"
            row["class"] = cls
            outliers.append(row)

    md = [
        "# Outlier postmortem: TPU sampler vs sequential C++ engine",
        "",
        f"Generated by `validation/outlier_postmortem.py` from "
        f"{len(rows)} per-rung records on "
        f"{len(set(r['pixel'] for r in rows))} pixels "
        f"(native nlive={nat['nlive']}, joint placement prior; "
        f"TPU nlive=100 x {len(t100)} seeds + nlive=400 x {len(t400)}).",
        "",
        f"Pooled native seed scatter: lnZ1 {s_model[1]:.3f}, "
        f"lnZ2 {s_model[2]:.3f} nats.",
        "",
        f"Records with |dz|/sigma > {OUTLIER_SIGMA:.0f}: "
        f"{len(outliers)} / {len(rows)} "
        f"({100 * len(outliers) / max(len(rows), 1):.1f}%).",
        "",
        "| pixel | rung | dz/sigma | TPU median | native median | "
        "TPU@400 | class |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in outliers:
        t4s = f"{r['tpu_nlive400']:.1f}" if r["tpu_nlive400"] is not None \
            else "-"
        md.append(
            f"| {r['pixel']} | {r['rung']} | {r['dz_sigma']:+.1f} | "
            f"{r['tpu_med']:.1f} | {r['nat_med']:.1f} | {t4s} | "
            f"**{r['class']}** |"
        )
    md.append("")
    for r in outliers:
        md += [
            f"## pixel {r['pixel']}, rung {r['rung']} -- {r['class']}",
            "",
            f"* dz/sigma = {r['dz_sigma']:+.1f} "
            f"(sigma = {r['sigma']:.3f}; native quoted err "
            f"{r['nat_err']:.3f}, pooled seed scatter folded in)",
            f"* TPU nlive=100 median {r['tpu_med']:.2f} "
            f"(seed scatter {r['tpu_scat']:.2f}); "
            f"TPU nlive=400 "
            + (f"{r['tpu_nlive400']:.2f}" if r["tpu_nlive400"] is not None
               else "n/a"),
            f"* native nlive=400 median {r['nat_med']:.2f}"
            + (f" (seed scatter {r['nat_scat']:.2f})"
               if r["nat_scat"] is not None else ""),
            f"* model selection: TPU nbest={r['tpu_nbest']}, "
            f"native nbest={r['nat_nbest']}",
            f"* truth params (param-major [voff trot tex ntot sigm "
            f"orth] x 2 comps): {r['truth']}",
            "",
        ]
    bad = [r for r in outliers
           if r["class"] in ("sampler-mode-loss", "unexplained")]
    md += [
        "## Verdict",
        "",
        ("All outliers are classified as benign (rung-1 misfit islands, "
         "nlive resolution, or baseline scatter)." if not bad else
         f"**{len(bad)} record(s) are NOT explained** -- fix the "
         "sampler, do not widen the gate."),
        "",
    ]
    out = os.path.join(HERE, "outlier_postmortem.md")
    with open(out, "w") as fh:
        fh.write("\n".join(md))
    print(f"wrote {out}: {len(outliers)} outliers, {len(bad)} unexplained")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
