"""Scalar/codec function library."""
