# Kaldi-style command-line option parsing for the recipe scripts
# (parity: examples/s2s_trans/parse_options.sh). Source AFTER defaulting
# your variables; then `--some-var value` on the command line overrides
# shell variable `some_var` (dashes map to underscores).
#
#   stage=${stage:-3}
#   . recipes/parse_options.sh
#   bash run_baseline.sh --stage 5 --stop-stage 7

while [ $# -gt 0 ]; do
  case "$1" in
    --help|-h)
      if [ -z "${help_message:-}" ]; then
        echo "usage: $0 [--var value]..." 1>&2
      else
        printf '%s\n' "$help_message" 1>&2
      fi
      exit 0
      ;;
    --*=*)
      echo "$0: options must be '--name value', got '$1'" 1>&2
      exit 1
      ;;
    --*)
      name=$(echo "$1" | sed -e 's/^--//' -e 's/-/_/g')
      if ! eval '[ -n "${'"$name"'+set}" ]'; then
        echo "$0: unknown option --${name//_/-}" 1>&2
        exit 1
      fi
      [ $# -ge 2 ] || { echo "$0: missing value for $1" 1>&2; exit 1; }
      eval "$name=\"\$2\""
      shift 2
      ;;
    *)
      break
      ;;
  esac
done
true
