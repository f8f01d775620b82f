"""device_query: enumerate accelerators (the ``caffe device_query`` brew
command, tools/caffe.cpp:111-121)."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    import jax

    devices = jax.devices()
    print(f"backend: {jax.default_backend()}")
    print(f"process {jax.process_index()} of {jax.process_count()}")
    for d in devices:
        mem = getattr(d, "memory_stats", lambda: None)()
        line = f"device {d.id}: {d.device_kind} (platform {d.platform})"
        if mem:
            total = mem.get("bytes_limit")
            if total:
                line += f", {total / 2**30:.1f} GiB"
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
