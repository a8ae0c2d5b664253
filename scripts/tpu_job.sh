#!/bin/bash
# Single-TPU-job launcher with the round-3/4 hard-won guards baked in
# (.claude/skills/verify/SKILL.md "TPU job queueing"):
#   - refuses to start if another bench.py/train*.py PYTHON process owns the
#     TPU (anchored on the interpreter so `tail -f train.py.log`, grep, or
#     an editor never trips it — ADVICE r4)
#   - the scan+spawn is serialized under flock so two simultaneous
#     launchers cannot both pass the scan (TOCTOU — ADVICE r4)
#   - writes ITS OWN pid (not a nohup wrapper's) to /tmp/tpu_<name>.pid and
#     the trainer child's pid to /tmp/tpu_<name>.child.pid, so a later kill
#     targets real processes by PID, never by pattern
#   - stale-log watchdog: kills the child after $STALE seconds without log
#     writes (tunnel wedges stall silently; trainers print a line before
#     their first compile so a cold compile is not mistaken for a wedge).
#     TERM -> KILL grace is 30s so a trainer mid-checkpoint can finish
#     (a 5s grace SIGKILLed trainers mid-dispatch, wedging the tunnel).
#
# Usage: scripts/tpu_job.sh <name> <logfile> <stale_secs> <cmd...>
# Exit: child's exit code, 98 if the TPU is busy, 99 if the watchdog killed it.
set -u
NAME="$1"; LOG="$2"; STALE="$3"; shift 3

echo $$ > "/tmp/tpu_${NAME}.pid"

LOCK=/tmp/tpu_job.lock
exec 9>"$LOCK"
if ! flock -w 30 9; then
    echo "REFUSING to launch ${NAME}: could not acquire ${LOCK} in 30s" >&2
    exit 98
fi

# TPU-owner scan: any OTHER python process running bench.py or a train
# script is assumed to hold the tunnel (one client at a time). Anchor on
# the interpreter token so log tails / greps / editors don't match.
for f in /proc/[0-9]*/cmdline; do
    pid="${f#/proc/}"; pid="${pid%/cmdline}"
    [ "$pid" = "$$" ] && continue
    [ "$pid" = "$PPID" ] && continue
    cmd=$(tr '\0' ' ' < "$f" 2>/dev/null) || continue
    case "$cmd" in
        python*\ *bench.py*|python*\ *train_fused*|python*\ *train.py*|python*\ *__graft_entry__*|*/python*\ *bench.py*|*/python*\ *train_fused*|*/python*\ *train.py*|*/python*\ *__graft_entry__*)
            echo "REFUSING to launch ${NAME}: TPU busy with pid ${pid}: ${cmd}" >&2
            flock -u 9
            exit 98;;
    esac
done

PYTHONUNBUFFERED=1 "$@" > "$LOG" 2>&1 &
CHILD=$!
echo "$CHILD" > "/tmp/tpu_${NAME}.child.pid"
flock -u 9
echo "[tpu_job] ${NAME}: child pid ${CHILD}, log ${LOG}, stale budget ${STALE}s"

while kill -0 "$CHILD" 2>/dev/null; do
    sleep 30
    if [ -f "$LOG" ]; then
        now=$(date +%s)
        mt=$(stat -c %Y "$LOG")
        if [ $((now - mt)) -gt "$STALE" ]; then
            echo "[tpu_job] ${NAME}: WATCHDOG_KILLED after $((now - mt))s stale" | tee -a "$LOG" >&2
            kill "$CHILD" 2>/dev/null
            for _ in $(seq 1 30); do
                kill -0 "$CHILD" 2>/dev/null || break
                sleep 1
            done
            kill -9 "$CHILD" 2>/dev/null
            exit 99
        fi
    fi
done
wait "$CHILD"
RC=$?
echo "[tpu_job] ${NAME}: child exited rc=${RC}"
exit $RC
