#!/bin/bash
# Round-15 item 2: attack the NAMED amplification mechanism
# (interpreted-execution under co-tenant JIT-compiler starvation).
# NOTE: the verdict's suggested -XX:CICompilerCount raise is moot on
# this box — the ergonomic default is ALREADY 15 compiler threads
# (java -XX:+PrintFlagsFinal); starvation deschedules them, it does
# not lack them. The testable lever is -Xbatch (synchronous
# compilation: a task thread WAITS for the compile instead of running
# interpreted — waiting burns no cpu and yields the core to the
# starved compiler threads), bracketed by the known C1 floor.
# Arms: e6_dedup_pipeline forks (HeavyRunner, n=2) under
#   A quiet default | B quiet -Xbatch
#   C quiet C1-floor (-XX:TieredStopAtLevel=1)
#   D load-30 default | E load-30 -Xbatch
# The discriminator is run-1 CPU-SECONDS (interpreted phases burn real
# cpu; scheduler contention alone inflates wall, not cpu).
set -u
cd /root/repo
ADDOPENS=$(python3 - <<'EOF'
ps=['java.base/java.lang','java.base/java.lang.invoke','java.base/java.lang.reflect','java.base/java.io','java.base/java.net','java.base/java.nio','java.base/java.util','java.base/java.util.concurrent','java.base/java.util.concurrent.atomic','java.base/sun.nio.ch','java.base/sun.nio.cs','java.base/sun.security.action','java.base/sun.util.calendar']
print(' '.join('--add-opens '+p+'=ALL-UNNAMED' for p in ps))
EOF
)
CP="target/scala-2.13/classes:/opt/spark/jars/*"
HEAVY=/tmp/graft_heavy_x10
Q=${1:-e6_dedup_pipeline}

run_fork () { # $1 = label, rest = extra JVM flags
  local label=$1; shift
  echo "== $label (load $(cut -d' ' -f1 /proc/loadavg)) =="
  java $ADDOPENS -Xmx48g "$@" -cp "$CP" graft.tools.HeavyRunner \
    "$HEAVY" 2 "$Q" 2>/dev/null | grep -E "^HEAVY"
}

spin_start () {
  for i in $(seq 30); do
    (while :; do :; done) &
    SPINS="${SPINS:-} $!"
  done
}
spin_stop () { kill $SPINS 2>/dev/null; wait 2>/dev/null; SPINS=""; }

case "${2:-all}" in
  quiet)
    run_fork "A default"      ;
    run_fork "B xbatch"       -Xbatch ;
    run_fork "C c1floor"      -XX:TieredStopAtLevel=1 ;;
  load)
    # E is C1-floor, not -Xbatch: the quiet arms REJECTED -Xbatch
    # (run-1 cpu 143.7 -> 728.7 cpu-s across two quiet repeats — the
    # synchronous-compile stall is itself firing-class)
    spin_start
    run_fork "D load default" ;
    run_fork "E load c1floor" -XX:TieredStopAtLevel=1 ;
    spin_stop ;;
  all)
    "$0" "$Q" quiet
    "$0" "$Q" load ;;
esac
