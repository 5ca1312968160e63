"""Multimodal (image/audio/video) column plumbing for training-data pipelines."""
