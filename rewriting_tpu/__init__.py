"""rewriting_tpu — a TPU-native (JAX/XLA/Pallas) model-rewriting framework.

A ground-up rebuild of the capabilities of davidbau/rewriting ("Rewriting a
Deep Generative Model", ECCV 2020) designed for TPU hardware:

- Generators (ProgGAN, StyleGAN2) are *functional stage pipelines* — ordered
  lists of named pure functions over a params pytree and a DataBag dict —
  instead of torch ``nn.Sequential`` modules (reference: utils/proggan.py,
  utils/stylegan2/models.py).
- Model surgery (reference: utils/nethook.py ``subsequence``) is list slicing
  of the stage pipeline; instrumentation is explicit value capture, not
  forward hooks.
- Streaming statistics (reference: utils/runningstats.py, utils/tally.py) are
  jit-compatible reducer states that can be psum-merged across a device mesh.
- The rank-constrained linear-associative-memory weight edit (reference:
  rewrite/ganrewrite.py) is a single jitted ``lax.fori_loop`` optimization.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keep `import rewriting_tpu` light)
    if name in ("ProgressiveGenerator", "SeqStyleGAN2"):
        from . import models
        return getattr(models, name)
    if name in ("GanRewriter", "ProgressiveGanRewriter",
                "SeqStyleGanRewriter", "SeqTinyStyleGanRewriter",
                "SeqPreStyleGanRewriter"):
        from . import rewrite
        return getattr(rewrite, name)
    if name == "load_seq_stylegan" or name == "load_proggan":
        from .models import zoo
        return getattr(zoo, name)
    raise AttributeError(name)
