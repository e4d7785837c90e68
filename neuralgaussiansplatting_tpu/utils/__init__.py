"""Losses, metrics, image helpers."""
