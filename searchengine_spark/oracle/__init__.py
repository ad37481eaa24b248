from .oracle import OracleIndex, build_oracle_index

__all__ = ["OracleIndex", "build_oracle_index"]
