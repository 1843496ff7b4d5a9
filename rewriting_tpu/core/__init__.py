from .stages import Stage, StagePipeline, subsequence
from .bag import DataBag

__all__ = ["Stage", "StagePipeline", "subsequence", "DataBag"]
