"""Corpus sources: synthetic cc_pages generator, accuracy-corpus reader."""
