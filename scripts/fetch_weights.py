"""Fetch all published pretrained weights into $REWRITING_TPU_WEIGHTS.

Downloads the same public artifacts the reference auto-downloads (GAN
checkpoints, the unified-parsing segmenter, the face parser, the published
edit-request masks) plus the FID Inception and VGG16 weights our metric
pipelines convert.  Needs network egress — in air-gapped environments copy
the files in by hand (the loaders print the expected path on miss).
"""

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rewriting_tpu.models.zoo import (PROGGAN_URL, PROGGAN_ZOO,
                                      STYLEGAN2_URL, STYLEGAN2_ZOO,
                                      weights_dir)

UPP_BASE = "http://netdissect.csail.mit.edu/data/segmodel/upp-resnet50-upernet"
UPP_FILES = ["decoder_epoch_40.pth", "encoder_epoch_40.pth", "labels.json"]
FACE_URL = ("https://rewriting.csail.mit.edu/data/models/"
            "face-parsing-02dd3f6f.pth")
FID_INCEPTION_URL = ("https://github.com/mseitzer/pytorch-fid/releases/"
                     "download/fid_weights/pt_inception-2015-12-05-"
                     "6726825d.pth")
VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
SLIMNET_URL = ("https://github.com/gtamba/pytorch-slim-cnn/raw/master/"
               "models/celeba_20.pth")
MASKS_URL = "http://rewriting.csail.mit.edu/data/masks/"
MASK_FILES = ["dome2spire.json", "dome2tree.json", "dome2castle.json",
              "smile.json"]


def fetch(url, dest):
    if os.path.exists(dest):
        print("have", dest)
        return
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    print("fetch", url)
    urllib.request.urlretrieve(url, dest + ".tmp")
    os.replace(dest + ".tmp", dest)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset: stylegan2 proggan upp face fid vgg slimnet masks")
    args = ap.parse_args()
    want = set(args.only or ["stylegan2", "proggan", "upp", "face", "fid",
                             "vgg", "slimnet", "masks"])
    wd = weights_dir()
    if "stylegan2" in want:
        for name, (filename, _) in STYLEGAN2_ZOO.items():
            fetch(STYLEGAN2_URL + filename, os.path.join(wd, filename))
    if "proggan" in want:
        for name, filename in PROGGAN_ZOO.items():
            fetch(PROGGAN_URL + filename, os.path.join(wd, filename))
    if "upp" in want:
        for fn in UPP_FILES:
            fetch(f"{UPP_BASE}/{fn}", os.path.join(wd, "upp", fn))
    if "face" in want:
        fetch(FACE_URL, os.path.join(wd, "face-parsing-02dd3f6f.pth"))
    if "fid" in want:
        fetch(FID_INCEPTION_URL,
              os.path.join(wd, "pt_inception-2015-12-05.pth"))
    if "vgg" in want:
        fetch(VGG16_URL, os.path.join(wd, "vgg16_features.pth"))
    if "slimnet" in want:
        fetch(SLIMNET_URL, os.path.join(wd, "celeba_20.pth"))
    if "masks" in want:
        masks = os.environ.get("REWRITING_TPU_MASKS", "masks")
        for fn in MASK_FILES:
            dataset = "faces" if fn == "smile.json" else "church"
            fetch(MASKS_URL + fn, os.path.join(masks, dataset, fn))
    print("done; weights in", wd)


if __name__ == "__main__":
    main()
