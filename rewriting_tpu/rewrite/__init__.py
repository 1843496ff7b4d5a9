from .rewriter import GanRewriter, ProgressiveGanRewriter, \
    SeqStyleGanRewriter, SeqTinyStyleGanRewriter
from .solve import projected_conv, zca_from_cov, insert_solve, \
    linear_insert_solve

__all__ = ["GanRewriter", "ProgressiveGanRewriter", "SeqStyleGanRewriter",
           "SeqTinyStyleGanRewriter", "projected_conv", "zca_from_cov",
           "insert_solve", "linear_insert_solve"]
