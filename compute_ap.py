"""AP / AP50 / AP25 from a single-object result CSV (reference
compute_ap.py:165-182)."""

import argparse

from agile3d_tpu.evaluation.ap import evaluate_ap


def get_args_parser():
    p = argparse.ArgumentParser("Compute AP", add_help=False)
    p.add_argument("--result_file",
                   default="results/val_results_single.csv", type=str)
    return p


def main(args):
    table = evaluate_ap(args.result_file)
    for k, scores in table.items():
        print(f"Results for {k} clicks.")
        print(f"AP:   {scores['all_ap']}")
        print(f"AP50: {scores['all_ap_50%']}")
        print(f"AP25: {scores['all_ap_25%']}")
        print()
    return table


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "Compute AP for interactive single-object segmentation",
        parents=[get_args_parser()])
    main(parser.parse_args())
