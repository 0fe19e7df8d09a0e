"""Render pipeline: ray gen, wavefront bounce loop, accumulation, output."""
