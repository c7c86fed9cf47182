"""Checkpoint / interop IO (torch .pt compat, orbax-native checkpoints)."""
