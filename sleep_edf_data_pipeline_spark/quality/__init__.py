"""Data-quality operators: schema contract, checks, quarantine."""
