"""Segmenter parity vs reference torch implementations (seeded random
weights through the checkpoint converters)."""

import numpy as np
import pytest

from rewriting_tpu.segment.faceparse import BiSeNet
from rewriting_tpu.segment.upernet import UPerNet

LABELDATA = {
    "object": ["-", "sky", "building", "tree"],
    "part": ["-", "roof", "window", "tree"],
    "material": ["-", "brick", "glass"],
    "scene": ["-", "outdoor"],
    "object_part": {"building": ["roof", "window", "tree"]},
}


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.mark.slow
def test_bisenet_parity(goldens):
    g = goldens("bisenet_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    net = BiSeNet(n_classes=19)
    params = net.params_from_torch(sd)
    x = np.transpose(g["x"], (0, 2, 3, 1))
    out = net(params, x)
    np.testing.assert_allclose(nchw(out), g["out"], atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_upernet_parity(goldens):
    g = goldens("upernet_tiny")
    enc_sd = {k[4:]: g[k] for k in g.files if k.startswith("enc.")}
    dec_sd = {k[4:]: g[k] for k in g.files if k.startswith("dec.")}
    object_to_num = {k: v for v, k in enumerate(LABELDATA["object"])}
    part_to_num = {k: v for v, k in enumerate(LABELDATA["part"])}
    object_part = {object_to_num[k]: [part_to_num[p] for p in v]
                   for k, v in LABELDATA["object_part"].items()}
    net = UPerNet({"object": 4, "part": 3, "material": 3, "scene": 2},
                  sorted(object_part.keys()), object_part)
    params = net.params_from_torch(enc_sd, dec_sd)
    # encoder features match to fp32 precision (see also the direct check
    # below); a random unnormalized resnet50 blows activations up to ~5e3,
    # so softmax outputs saturate and tiny fp differences flip saturated
    # probabilities — compare feature maps tightly and decisions at the
    # softmax level.
    from rewriting_tpu.segment.resnet import resnet50_features
    img = np.transpose(g["img"], (0, 2, 3, 1))
    feats = resnet50_features(params["encoder"], img)
    for i in range(4):
        ref = g[f"feat_{i}"]
        scale = np.abs(ref).max()
        np.testing.assert_allclose(nchw(feats[i]) / scale, ref / scale,
                                   atol=1e-5, err_msg=f"feat_{i}")
    out = net(params, img, seg_size=(64, 64))
    for key, mine in [("object", nchw(out["object"])),
                      ("material", nchw(out["material"])),
                      ("part_0", nchw(out["part"][0]))]:
        ref = g[key]
        agree = (mine.argmax(1) == ref.argmax(1)).mean()
        assert agree > 0.95, (key, agree)
    assert int(np.asarray(out["scene"]).argmax()) == int(
        g["scene"].argmax())
