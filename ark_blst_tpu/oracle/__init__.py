"""Trusted pure-Python BLS12-381 oracle (L0). See SURVEY.md §7."""

from . import curve, field, pairing, serialize  # noqa: F401
