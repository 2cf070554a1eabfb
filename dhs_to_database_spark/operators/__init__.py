"""Operator pack: relational (§2.B), metadata (§2.A), extensions (§2.D)."""
