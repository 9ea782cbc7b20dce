"""Cleaning/coercion transforms (reference utils.py semantics)."""
