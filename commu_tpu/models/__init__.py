from .transformer_xl import Memory, TransformerXL, init_memory, token_nll  # noqa: F401
from .convert import flax_params_from_torch_state, torch_state_from_flax_params  # noqa: F401
