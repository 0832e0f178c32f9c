"""Placeholder — queries registered in a later milestone."""
