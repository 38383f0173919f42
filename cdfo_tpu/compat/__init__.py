from .torch_convert import convert_state_dict, flax_to_torch_key

__all__ = ["convert_state_dict", "flax_to_torch_key"]
