"""Backbones, shared blocks, and matching heads."""
