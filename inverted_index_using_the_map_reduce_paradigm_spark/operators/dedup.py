"""Placeholder — operators land in this round."""
