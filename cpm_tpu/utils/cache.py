"""Persistent XLA compilation cache.

The CPM train/eval programs are large; first-time XLA compiles are
expensive (minutes on CPU rigs, tens of seconds on TPU). Enabling jax's
persistent compilation cache makes every subsequent process start
near-instant for unchanged programs.
"""

import os
import platform


def _raw_cpuid_fingerprint() -> str:
    """Raw CPUID identity leaves, read at call time.

    /proc/cpuinfo (and the kernel boot id) are populated at BOOT and do
    NOT change across a LIVE VM migration, but LLVM's host detection
    (the +prefer-no-scatter/-gather tuning attrs baked into XLA:CPU AOT
    results) executes CPUID directly — so raw CPUID is the only
    process-visible signal that the host under a live-migrated VM
    changed. /dev/cpu/0/cpuid pread encoding: low 32 bits of the file
    position are %eax (leaf), high 32 bits %ecx (subleaf); each read
    returns eax,ebx,ecx,edx (16 bytes)."""
    leaves = [(0x0, 0), (0x1, 0), (0x7, 0), (0x7, 1), (0x80000001, 0)]
    try:
        with open("/dev/cpu/0/cpuid", "rb", buffering=0) as f:
            out = []
            for leaf, sub in leaves:
                f.seek(leaf | (sub << 32))
                out.append(f.read(16).hex())
            return ",".join(out)
    except OSError:
        return ""


def enable_persistent_cache(cache_dir: str = None):
    import jax

    if cache_dir is None:
        # key by machine + cpu so AOT executables cached on one host are
        # never loaded on another (XLA:CPU AOT results are
        # machine-feature-specific and can SIGILL cross-machine).
        # Hostname alone is NOT enough: fleet VMs share a node name but
        # differ in CPU extensions (observed: cached code compiled with
        # +amx-avx512-era flags SIGILLs on a host without them), so the
        # actual cpuinfo flag set is hashed into the key. The flag list
        # alone is ALSO not enough: LLVM detects tuning attributes
        # (+prefer-no-scatter/-gather) from raw CPUID, which can change
        # across a VM migration while kernel-reported flags stay fixed
        # (observed: stale AOT entries loaded with "machine type ...
        # doesn't match" warnings and ~1e-2 numeric drift vs a fresh
        # compile). Hash the CPUID identity lines (family/model/
        # stepping/model name) and the jax version into the key too.
        feat_lines = []
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(
                        ("flags", "cpu family", "model", "stepping")
                    ):
                        feat_lines.append(line.strip())
                    if line.strip() == "" and feat_lines:
                        break  # first core only; all cores identical
        except OSError:
            pass
        import hashlib

        import jax as _jax

        # CPU-platform processes additionally key by boot id: XLA:CPU AOT
        # results embed LLVM tuning attributes detected from raw CPUID
        # (+prefer-no-scatter/-gather) that can change across a VM
        # migration while every kernel-reported identity above stays
        # fixed — observed loading stale entries with "machine type ...
        # doesn't match" warnings (SIGILL/drift risk). CPU compiles are
        # cheap; only the TPU entries need to survive VM resets.
        boot = ""
        platforms = os.environ.get("JAX_PLATFORMS", "")
        try:
            import jax as _j

            platforms = platforms or (_j.config.jax_platforms or "")
        except Exception:
            pass
        # "cpu" named explicitly, or nothing named at all (a no-TPU
        # process falls back to CPU implicitly and needs the same
        # migration-proofing); only a platforms string that selects a
        # non-CPU backend keeps the stable migration-surviving key.
        # boot id catches reboots onto new hardware; the raw-CPUID
        # fingerprint additionally catches LIVE migrations, which
        # preserve boot id and /proc/cpuinfo but change what LLVM's
        # CPUID-based host detection bakes into AOT results.
        if (not platforms) or ("cpu" in platforms):
            try:
                with open("/proc/sys/kernel/random/boot_id") as f:
                    boot = "|" + f.read().strip()
            except OSError:
                pass
            cpuid = _raw_cpuid_fingerprint()
            if cpuid:
                boot += "|" + cpuid
        fhash = hashlib.sha1(
            ("|".join(sorted(set(feat_lines))) + f"|jax{_jax.__version__}"
             + boot).encode()
        ).hexdigest()[:10]
        tag = f"{platform.node()}-{platform.machine()}-{fhash}"
        cache_dir = os.environ.get(
            "CPM_TPU_JAX_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))),
                f".jax_cache-{tag}",
            ),
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return cache_dir
