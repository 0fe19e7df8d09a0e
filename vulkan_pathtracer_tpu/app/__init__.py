"""Headless application driver (the main.zig analog)."""
