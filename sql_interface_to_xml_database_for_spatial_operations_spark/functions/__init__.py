"""Scalar function library: spatial (SURVEY.md §2.6 F1-F12) and text."""
