from .blob import TrackBlob
from .individual import Individual, IndividualCache
from .matching import MatchResult, PairedProbabilities, match
from .motion import MotionRecord
from .prefilter import FilterReason, PrefilterResult, SizeFilters, prefilter
from .splitting import HistorySplit, split_blob
from .tracker import FrameStatistics, PPFrame, Tracker

__all__ = [
    "TrackBlob", "Individual", "IndividualCache", "MatchResult",
    "PairedProbabilities", "match", "MotionRecord", "FilterReason",
    "PrefilterResult", "SizeFilters", "prefilter", "HistorySplit",
    "split_blob", "FrameStatistics", "PPFrame", "Tracker",
]
