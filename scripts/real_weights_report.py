"""One-command real-checkpoint parity runbook (VERDICT round-4 item 4).

On any machine where the published weights can be mounted (or fetched):

    export REWRITING_TPU_WEIGHTS=/path/to/weights
    python scripts/fetch_weights.py            # if egress exists
    python scripts/real_weights_report.py      # this script

It (1) inventories which artifacts are present, (2) regenerates the
reference-side goldens that need torch + /root/reference (forward
fixtures) and pytorch-fid (the FID A/B value) when those are available,
(3) runs the gated suite tests/test_real_weights.py, and (4) prints a
pass/skip parity report.  Every step degrades to an explicit SKIP line
instead of failing, so partial mounts still produce a useful report.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = [
    ("stylegan2 zoo (8)", ["stylegan2_church.pt", "stylegan2_bedroom.pt",
                           "stylegan2_car.pt", "stylegan2_cat.pt",
                           "stylegan2_faces.pt", "stylegan2_horse.pt",
                           "stylegan2_kitchen.pt", "stylegan2_places.pt"]),
    ("proggan zoo (8)", ["proggan_churchoutdoor-7e701dd5.pth"]),
    ("FID inception", ["pt_inception-2015-12-05.pth"]),
    ("VGG16 (LPIPS/overfit)", ["vgg16-397923af.pth"]),
    ("LPIPS lin heads", ["lpips_vgg_lins.pth"]),
    ("unified parsing segmenter", [os.path.join("upp",
                                                "encoder_epoch_40.pth")]),
    ("face parser", ["face-parsing-02dd3f6f.pth"]),
    ("SlimNet", ["celeba_20.pth"]),
    ("published masks", [os.path.join("masks", "dome2spire.json")]),
    ("forward fixtures", [os.path.join("goldens",
                                       "stylegan2_church_forward.npz")]),
    ("FID parity value", [os.path.join("goldens", "fid_parity.json")]),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-goldens", action="store_true",
                    help="don't regenerate reference-side goldens")
    args = ap.parse_args()

    wd = os.environ.get("REWRITING_TPU_WEIGHTS", "")
    if not wd or not os.path.isdir(wd):
        sys.exit("set $REWRITING_TPU_WEIGHTS to the weights mount first "
                 "(scripts/fetch_weights.py fills it where egress exists)")

    print(f"== artifact inventory ({wd})")
    for name, files in ARTIFACTS:
        have = sum(os.path.isfile(os.path.join(wd, f)) for f in files)
        print(f"  {'OK  ' if have == len(files) else 'MISS'} {name} "
              f"({have}/{len(files)} probe files)")

    if not args.skip_goldens:
        print("== regenerating reference-side goldens (torch CPU)")
        r = subprocess.run([sys.executable,
                            os.path.join(REPO, "scripts", "make_goldens.py")],
                           cwd=REPO)
        if r.returncode != 0:
            print("  SKIP: make_goldens failed (needs /root/reference "
                  "mount + cpu torch; gated tests still run against any "
                  "existing fixtures)")

    print("== gated suite")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_real_weights.py",
         "-v", "-rs", "--tb=short"], cwd=REPO)

    print("== parity report")
    # re-collect to count outcomes machine-readably
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_real_weights.py",
         "-q", "--tb=no"], cwd=REPO, capture_output=True, text=True)
    tail = [ln for ln in out.stdout.strip().splitlines() if ln][-1:]
    summary = tail[0] if tail else "no summary"
    report = {"weights_dir": wd, "pytest_rc": out.returncode,
              "summary": summary}
    print(json.dumps(report))
    if "failed" in summary:
        sys.exit("PARITY FAILURES above — the converters or metrics "
                 "disagree with the reference on real checkpoints")
    print("no parity failures; any SKIP lines list the still-unmounted "
          "artifacts")


if __name__ == "__main__":
    main()
