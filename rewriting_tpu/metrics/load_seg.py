"""Experiment -> segmenter + source/target label registry
(reference: metrics/load_seg.py)."""

from __future__ import annotations

# BiSeNet face-parsing class list (reference load_seg.py:46); predictions
# are 1-indexed.
face_atts = ["skin", "l_brow", "r_brow", "l_eye", "r_eye", "eye_g",
             "l_ear", "r_ear", "ear_r", "nose", "mouth", "u_lip", "l_lip",
             "neck", "neck_l", "cloth", "hair", "hat"]
smile_src = [face_atts.index("u_lip") + 1, face_atts.index("l_lip") + 1,
             face_atts.index("mouth") + 1]

# exp name -> (segmenter name, src channel, tgt channel, src labels,
#              tgt labels)  (reference load_seg.py:49-54)
info = {
    "dome2spire": ["netpqc", 2, 0, [1708], [5]],
    "church_clean": ["netpqc", None, None, None, None],
    "smile": ["face", 0, None, smile_src, None],
    "faces_clean": ["face", None, None, None, None],
}


def register_experiment(exp_name, segmenter_name, srcc, tgtc, srcs, tgts):
    """Add a new experiment to the registry (dome2tree/dome2castle reuse
    the dome2spire pipeline with their own target labels)."""
    info[exp_name] = [segmenter_name, srcc, tgtc, srcs, tgts]


def load_seg_info_from_exp_name(exp_name: str):
    segmenter_name, srcc, tgtc, srcs, tgts = info[exp_name]
    return segmenter_name, srcc, tgtc, srcs, tgts


def load_seg_model(exp_name: str):
    """Instantiate the segmenter for an experiment
    (reference load_seg.py:36-43)."""
    seg_name = load_seg_info_from_exp_name(exp_name)[0]
    from ..segment import load_segmenter
    if seg_name == "face":
        from ..segment.faceparse import FaceSegmenter
        return FaceSegmenter()
    model, _ = load_segmenter(seg_name)
    return model
