#!/bin/bash
# One process per XLA flag set (flags are read once at backend init).
# Each probe remote-compiles (~30-250 s); failures are non-fatal.
cd /root/repo
run() {
  label="$1"; flags="$2"
  echo "=== $label [$flags] ==="
  PROBE_LABEL="$label" XLA_FLAGS="$flags" timeout 900 \
    python experiments/xla_flag_probe.py || echo "FAILED: $label"
}

run baseline ""
run vmem32m "--xla_tpu_scoped_vmem_limit_kib=32768"
run vmem64m "--xla_tpu_scoped_vmem_limit_kib=65536"
run vmem96m "--xla_tpu_scoped_vmem_limit_kib=98304"
run lhs "--xla_tpu_enable_latency_hiding_scheduler=true"
run vmem64m_lhs "--xla_tpu_scoped_vmem_limit_kib=65536 --xla_tpu_enable_latency_hiding_scheduler=true"
echo "ALL DONE"
