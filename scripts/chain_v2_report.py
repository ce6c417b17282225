"""Render the chain-v2 quality-run results as a markdown table.

Reads the per-scale ``.done.json`` resume markers written by
scripts/chain_v2_run.py (so it works on a partial chain too) and prints
the endpoint row of each scale's validation curve next to its bicubic
twin, plus the warm-vs-cold x4 delta — the summary recorded in
docs/VALIDATION.md (reference chain protocol: model/sradsgan.py:716-721).

Run: python scripts/chain_v2_report.py
"""
import glob
import json
import os

PERSIST = "/root/repo/.chain_v2"
ORDER = ["x2", "x3", "x4", "x4_cold", "x8", "x9"]


def main():
    done = {}
    for path in glob.glob(os.path.join(PERSIST, "*.done.json")):
        tag = os.path.basename(path)[: -len(".done.json")]
        with open(path) as f:
            done[tag] = json.load(f)["curve"]

    print("| scale | steps | SR PSNR | bicubic | dSR-bc | SSIM (SR/bc)"
          " | ERGAS |")
    print("|---|---|---|---|---|---|---|")
    for tag in ORDER:
        if tag not in done:
            print(f"| {tag} | (not finished) | | | | | |")
            continue
        end = done[tag][-1]
        d = end["psnr"] - end["bc_psnr"]
        print(f"| {tag} | {end['step']} | {end['psnr']:.2f} |"
              f" {end['bc_psnr']:.2f} | {d:+.2f} |"
              f" {end['ssim']:.3f} / {end['bc_ssim']:.3f} |"
              f" {end['ergas']:.3f} |")

    if "x4" in done and "x4_cold" in done:
        warm, cold = done["x4"][-1], done["x4_cold"][-1]
        print(f"\nwarm-vs-cold x4 @ {warm['step']} steps: "
              f"{warm['psnr']:.2f} vs {cold['psnr']:.2f} dB "
              f"({warm['psnr'] - cold['psnr']:+.2f})")
        # early-step advantage: the warm start's value shows up fastest
        for i in range(min(len(done["x4"]), len(done["x4_cold"]))):
            w, c = done["x4"][i], done["x4_cold"][i]
            if w["step"] != c["step"]:
                break
            print(f"  step {w['step']:>5}: warm {w['psnr']:.2f} "
                  f"cold {c['psnr']:.2f} ({w['psnr'] - c['psnr']:+.2f})")


if __name__ == "__main__":
    main()
