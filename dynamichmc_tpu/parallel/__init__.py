from .chains import CHAIN_AXIS, chain_mesh, init_chain_states, run_chains
from .multihost import global_chain_mesh, run_chains_multihost

__all__ = [
    "CHAIN_AXIS",
    "chain_mesh",
    "init_chain_states",
    "run_chains",
    "global_chain_mesh",
    "run_chains_multihost",
]
