from .dataset import CVCPDataset, TrainBatcher
from .io import load_eval_sequence, make_synthetic_cvcp_tree

__all__ = ["CVCPDataset", "TrainBatcher", "load_eval_sequence",
           "make_synthetic_cvcp_tree"]
