"""Render the quality-sweep JSONL into the RESULTS.md table + verdict.

Reads /tmp/quality_sweep.jsonl (tools/quality_sweep.py output) and prints:
  * a markdown table (per image: recon cosines, tuned p5, floor p5, fb p5)
  * aggregate stats per image group (demo / DAVIS / synthetic VOC)
  * the paired tuned-vs-floor comparison that decides whether the tuned
    bench defaults stay (tuned p5 >= seed-floor p5 - noise) or get backed
    off (tuned consistently below the method's own reproducibility).
"""

import json
import sys

import numpy as np


def group_of(img):
    if "davis" in img:
        return "davis"
    if "synth" in img:
        return "synthetic-voc"
    return "demo"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/quality_sweep.jsonl"
    rows = []
    for ln in open(path):
        if not ln.strip():
            continue
        try:  # tolerate one truncated line from a mid-append kill
            rows.append(json.loads(ln))
        except json.JSONDecodeError:
            print(f"(skipping malformed line: {ln[:60]!r})", file=sys.stderr)
    rows = [r for r in rows if "tuned_cos_p5" in r]
    print(f"N = {len(rows)} images\n")
    print("| image | recon exact/tuned | tuned cos mean/p5 | "
          "seed-floor mean/p5 | fallback p5 |")
    print("|---|---|---|---|---|")
    for r in rows:
        name = r["img"].split("/")[-1]
        g = group_of(r["img"])
        fl = (f"{r['floor_cos_mean']:.4f} / {r['floor_cos_p5']:.4f}"
              if "floor_cos_p5" in r else "—")
        fb = f"{r['fb_cos_p5']:.4f}" if "fb_cos_p5" in r else "—"
        print(f"| {name} ({g}) | {r['recon_exact']:.4f} / "
              f"{r['recon_tuned']:.4f} | {r['tuned_cos_mean']:.4f} / "
              f"{r['tuned_cos_p5']:.4f} | {fl} | {fb} |")

    t = np.array([r["tuned_cos_p5"] for r in rows])
    m = np.array([r["tuned_cos_mean"] for r in rows])
    re = np.array([r["recon_exact"] for r in rows])
    rt = np.array([r["recon_tuned"] for r in rows])
    print(f"\nALL: tuned mean-cos {m.mean():.4f} (min {m.min():.4f}); "
          f"tuned p5 mean {t.mean():.4f} min {t.min():.4f}; "
          f"recon delta (tuned-exact) mean {np.mean(rt - re):+.4f}")
    for g in ("demo", "davis", "synthetic-voc"):
        sel = [r for r in rows if group_of(r["img"]) == g]
        if not sel:
            continue
        tg = np.array([r["tuned_cos_p5"] for r in sel])
        print(f"  {g:14s} n={len(sel):2d}  tuned p5 mean {tg.mean():.4f} "
              f"min {tg.min():.4f}")

    paired = [(r["tuned_cos_p5"], r["floor_cos_p5"])
              for r in rows if "floor_cos_p5" in r]
    if paired:
        tp = np.array([p[0] for p in paired])
        fp = np.array([p[1] for p in paired])
        print(f"\nPAIRED (n={len(paired)}): tuned p5 mean {tp.mean():.4f} "
              f"vs exact-seed-floor p5 mean {fp.mean():.4f}; "
              f"tuned >= floor on {(tp >= fp).sum()}/{len(paired)} images; "
              f"mean delta {np.mean(tp - fp):+.4f}")
    fbp = [(r["tuned_cos_p5"], r["fb_cos_p5"])
           for r in rows if "fb_cos_p5" in r]
    if fbp:
        d = np.array([a - b for a, b in fbp])
        verdict = ("level dropout is NOT the source of the tail"
                   if d.mean() >= -0.002 else
                   "level dropout IS hurting the tail - back it off")
        print(f"FALLBACK (no-dropout) vs tuned on {len(fbp)} images: "
              f"tuned p5 - fallback p5 mean {d.mean():+.4f} ({verdict})")


if __name__ == "__main__":
    main()
