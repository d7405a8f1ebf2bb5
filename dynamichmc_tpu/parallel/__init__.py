from .chains import CHAIN_AXIS, chain_mesh, init_chain_states, run_chains

__all__ = ["CHAIN_AXIS", "chain_mesh", "init_chain_states", "run_chains"]
