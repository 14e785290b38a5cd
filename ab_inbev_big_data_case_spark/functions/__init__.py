"""Reusable column-expression builders (the engine's scalar function layer)."""
