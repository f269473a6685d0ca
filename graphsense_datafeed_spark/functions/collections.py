"""Placeholder — operators land in this module incrementally."""
