"""Scalar/array function helpers shared across operators."""
