from .scan_params import from_scan_trunk, to_scan_trunk
from .torch_convert import convert_state_dict, flax_to_torch_key

__all__ = ["convert_state_dict", "flax_to_torch_key", "to_scan_trunk",
           "from_scan_trunk"]
