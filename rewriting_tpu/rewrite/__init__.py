from .rewriter import GanRewriter, ProgressiveGanRewriter, \
    SeqPreStyleGanRewriter, SeqStyleGanRewriter, SeqTinyStyleGanRewriter
from .solve import projected_conv, zca_from_cov, insert_solve, \
    linear_insert_solve

__all__ = ["GanRewriter", "ProgressiveGanRewriter", "SeqStyleGanRewriter",
           "SeqTinyStyleGanRewriter", "SeqPreStyleGanRewriter",
           "projected_conv", "zca_from_cov", "insert_solve",
           "linear_insert_solve"]
