from .segmenter import (BaseSegmenter, MergedSegmenter, NoSegmenter,
                        UnifiedParsingSegmenter, load_segmenter)

__all__ = ["BaseSegmenter", "MergedSegmenter", "NoSegmenter",
           "UnifiedParsingSegmenter", "load_segmenter"]
