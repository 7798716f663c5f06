"""Tiebreak C (shm+zstd) vs D (shm+parquet-v2): 5 reps each, fresh JVM."""
import subprocess, sys, time

if __name__ == "__main__":
    import os
    sys.argv_base = None
    for name in ("D_shm_pv2", "C_shm_zstd", "E_shm_zstd_pv2"):
        subprocess.run([sys.executable, "/root/repo/tools/prof_ingest_r11.py", name])
        time.sleep(30)
