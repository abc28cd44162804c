"""Command-line interface, compatible with the reference ``soundswallower``
CLI (py/soundswallower/cli.py): takes audio files, outputs line-JSON time
alignments.

  soundswallower --align input.txt audio.wav
  soundswallower --align-text "hello world" audio.wav --phone-align
  soundswallower --grammar input.gram audio.wav
  soundswallower --fsg input.fsg audio.wav
  soundswallower --model fr-fr ...
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional, Sequence

from . import get_model_path
from .config import Config
from .decoder import Decoder


def make_argparse() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("inputs", nargs="*", help="Input files.")
    parser.add_argument("--help-config", action="store_true",
                        help="Print help for decoder configuration parameters.")
    parser.add_argument("--dict", help="Custom dictionary file.")
    parser.add_argument("--model", default="en-us",
                        help="Specific model, built-in or from directory.")
    parser.add_argument("--config", help="JSON file with decoder configuration.")
    parser.add_argument("-s", "--set", action="append",
                        help="Set configuration parameter (KEY=VALUE).")
    parser.add_argument("--write-config",
                        help="Write full configuration as JSON to OUTPUT and exit.")
    parser.add_argument("-o", "--output",
                        help="Filename for output (default is standard output)")
    parser.add_argument("-v", "--verbose", action="store_true", help="Be verbose.")
    parser.add_argument("--phone-align", action="store_true",
                        help="Produce phone-level alignments")
    parser.add_argument("--state-align", action="store_true",
                        help="Produce state-level alignments")
    grammars = parser.add_mutually_exclusive_group()
    grammars.add_argument("-a", "--align", help="Input text file for force alignment.")
    grammars.add_argument("-t", "--align-text", help="Input text for force alignment.")
    grammars.add_argument("-g", "--grammar", help="Grammar file for recognition.")
    grammars.add_argument("-f", "--fsg", help="FSG file for recognition.")
    return parser


def make_decoder_config(args: argparse.Namespace) -> Config:
    config = Config()
    if args.config is not None:
        with open(args.config) as fh:
            config.parse_json(fh.read())
    model_path = get_model_path()
    if args.model in os.listdir(model_path):
        config["hmm"] = os.path.join(model_path, args.model)
    else:
        config["hmm"] = args.model
    if args.dict is not None:
        config["dict"] = args.dict
    if args.grammar is not None:
        config["jsgf"] = args.grammar
    if args.fsg is not None:
        config["fsg"] = args.fsg
    if args.verbose:
        config["loglevel"] = "INFO"
        config["backtrace"] = True
    if args.set:
        for kv in args.set:
            key, value = kv.split("=")
            config[key] = value
    return config


def print_config_help(config: Config) -> None:
    print("Configuration parameters:")
    for name, typ, dflt, hlp in config.describe():
        print("\t%s (%s%s):\n\t\t%s"
              % (name, typ, (", default: %s" % dflt) if dflt else "", hlp))


def main(argv: Optional[Sequence[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO)
    parser = make_argparse()
    args = parser.parse_args(argv)
    config = make_decoder_config(args)
    if args.help_config:
        print_config_help(config)
        sys.exit(0)
    if args.write_config is not None:
        out = sys.stdout if args.write_config == "-" else open(args.write_config, "w")
        out.write(config.serialize_json())
        if out is not sys.stdout:
            out.close()
        return
    if args.align:
        with open(args.align) as fh:
            args.align_text = fh.read().strip()
    elif args.grammar or args.fsg or args.align_text:
        pass
    else:
        return  # Nothing to do!
    decoder = Decoder(config)
    if args.align_text is not None:
        decoder.set_align_text(args.align_text)
    # reference behavior: align_level = bool(phone_align) (cli.py:166);
    # --state-align is our extension for level 2
    align_level = 2 if args.state_align else (1 if args.phone_align else 0)
    results = []
    for input_file in args.inputs:
        decoder.decode_file(input_file)
        results.append(decoder.dumps(align_level=align_level))
    if args.output is not None:
        with open(args.output, "w") as outfh:
            for json_line in results:
                outfh.write(json_line)
    else:
        for json_line in results:
            print(json_line, end="")


if __name__ == "__main__":
    main()
