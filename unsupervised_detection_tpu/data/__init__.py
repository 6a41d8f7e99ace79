from .base import SequenceDataset, PairIndex
from .davis import Davis2016Reader
from .fbms import FBMS59Reader
from .segtrack import SegTrackV2Reader
from .loader import HostLoader, TrainPipeline, TestPipeline


def get_reader(dataset: str, root_dir: str, **kw):
    """Dataset dispatch (adversarial_learner.py:22-67)."""
    if dataset == "DAVIS2016":
        return Davis2016Reader(root_dir, **kw)
    if dataset == "FBMS":
        return FBMS59Reader(root_dir, **kw)
    if dataset == "SEGTRACK":
        return SegTrackV2Reader(root_dir, **kw)
    raise IOError("Dataset should be DAVIS2016 / FBMS / SEGTRACK")
