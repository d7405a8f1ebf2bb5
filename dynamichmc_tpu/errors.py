"""Structured errors with debug payloads.

Mirrors the behavior of ``DynamicHMCError`` (/root/reference/src/utilities.jl:17-38):
an exception that carries a message plus named debug values (position, gradient,
stepsize, ...) printed in full. Raised only from *eager* (host-side) code paths —
inside jitted code, numerical faults are handled by -inf poisoning, never by
exceptions (see hamiltonian.py).
"""

from __future__ import annotations


class DynamicHMCError(RuntimeError):
    """Error with a message and an arbitrary payload of debug values."""

    def __init__(self, message: str, **payload):
        self.message = message
        self.payload = payload
        super().__init__(message)

    def __str__(self) -> str:
        lines = [self.message]
        for key, value in self.payload.items():
            lines.append(f"  {key} = {value!r}")
        return "\n".join(lines)


def _error(message: str, **payload):
    raise DynamicHMCError(message, **payload)
