"""Host-keyed persistent compile-cache paths.

The XLA persistent compilation cache stores CPU AOT results compiled for the
*build* host's exact machine features; reusing one cache directory across
heterogeneous hosts (shared /tmp on machines with different AVX-512/AMX
feature sets) loads binaries the executing CPU may not support — XLA warns
"could lead to execution errors such as SIGILL". Keying the directory by a
fingerprint of the host's CPU features makes every host hit only its own
entries. Pure stdlib: importing this module must not initialize JAX (see
the import-ordering note in CLAUDE.md).
"""

from __future__ import annotations

import hashlib
import platform


def host_fingerprint() -> str:
    """Stable 12-hex digest of the host CPU's identity (arch + feature
    flags + model name), matching what XLA:CPU AOT specializes on."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of the first processor block
                # model name AND the feature-flag line (x86 "flags", arm
                # "Features") — model name alone collides across hosts whose
                # hypervisors mask different feature sets, which is exactly
                # what XLA:CPU AOT specializes on
                if line.startswith(("flags", "model name", "Features")):
                    parts.append(line.strip())
    except OSError:
        parts.append(platform.processor() or "")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def host_keyed_cache_dir(base: str) -> str:
    """``base`` extended with the host fingerprint, e.g.
    ``/tmp/jax_cache-1a2b3c4d5e6f``."""
    return f"{base}-{host_fingerprint()}"
