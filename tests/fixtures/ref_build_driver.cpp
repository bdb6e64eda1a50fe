// Differential driver for the reference's BUILD path, verbatim:
// FunctionMap (id assignments, genome inference, keep policy,
// function.index writer) and SignatureBuilder (k-mer extraction with the
// 20-AA whitelist, per-k-mer top-2 / 80%-rule selection, avg_from_end,
// statistics counters) from function_map.h + signature_build.h/.tcc,
// compiled with the std-only shims and run single-threaded.
//
// Usage: ref_build_driver OUTDIR < config
// Config lines (one per line, order preserved):
//   min_reps N        assign PATH       fasta PATH      fasta_keep PATH
//   deleted PATH      ignored PATH      good_fn NAME    good_role NAME
// function.index is written into OUTDIR.  Stdout:
//   KMER \t kmer \t function_index \t avg_from_end
//   SEQF \t fI \t count             (kmer_stats.seqs_with_func)
//   DFUNC \t fI \t count            (kmer_stats.distinct_functions)
//   STATS \t distinct_signatures \t n_seqs_with_a_signature
// (mean/median/var of StoredKmerData flow through the shim accumulator,
// which is not boost — they are intentionally not printed.)
#include <algorithm>
#include <climits>  // function_map.h uses USHRT_MAX without <climits>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <unistd.h>
#include <vector>

#include "signature_build.h"

static std::set<std::string> load_set(const std::string &path) {
    std::set<std::string> out;
    if (path.empty())
        return out;
    std::ifstream in(path);
    std::string line;
    while (std::getline(in, line))
        if (!line.empty())
            out.insert(line);
    return out;
}

int main(int argc, char **argv) {
    if (argc != 2) {
        std::cerr << "usage: ref_build_driver OUTDIR < config\n";
        return 2;
    }
    std::vector<fs::path> defs, fastas, keep_fastas;
    std::vector<std::string> good_fns, good_roles;
    std::string deleted_path, ignored_path;
    int min_reps = 3;

    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream ss(line);
        std::string key;
        ss >> key;
        std::string rest;
        std::getline(ss, rest);
        if (!rest.empty() && rest[0] == ' ')
            rest = rest.substr(1);
        if (key == "min_reps") min_reps = std::stoi(rest);
        else if (key == "assign") defs.emplace_back(rest);
        else if (key == "fasta") fastas.emplace_back(rest);
        else if (key == "fasta_keep") keep_fastas.emplace_back(rest);
        else if (key == "deleted") deleted_path = rest;
        else if (key == "ignored") ignored_path = rest;
        else if (key == "good_fn") good_fns.push_back(rest);
        else if (key == "good_role") good_roles.push_back(rest);
    }

    // fm.dump() writes "fm.dump" into the CWD — park it in OUTDIR so the
    // test can diff the id->function map (paths above are absolute)
    if (chdir(argv[1]) != 0)
        return 3;

    SignatureBuilder<8> builder(1, 100000);  // kmers-build-signatures.cc:17-18
    builder.load_function_data(good_fns, good_roles, defs);
    std::set<std::string> deleted = load_set(deleted_path);
    std::set<std::string> ignored = load_set(ignored_path);
    builder.load_fasta(fastas, false, deleted);
    builder.load_fasta(keep_fastas, true, deleted);  // flag inert in the ref
    builder.process_kept_functions(min_reps, fs::path(argv[1]), ignored);
    const_cast<FunctionMap &>(builder.function_map()).dump();
    builder.extract_kmers(deleted);
    builder.process_kmers();

    // sorted dump for deterministic comparison
    std::vector<std::pair<std::string, const KeptKmer<8> *>> kept;
    for (auto &ent : builder.kept_kmers())
        kept.emplace_back(std::string(ent.first.begin(), ent.first.end()),
                          &ent.second);
    std::sort(kept.begin(), kept.end());
    for (auto &kv : kept)
        printf("KMER\t%s\t%u\t%u\n", kv.first.c_str(),
               (unsigned)kv.second->stored_data.function_index,
               (unsigned)kv.second->stored_data.avg_from_end);

    auto &st = builder.kmer_stats();
    std::map<int, int> seqf(st.seqs_with_func.begin(), st.seqs_with_func.end());
    for (auto &p : seqf)
        printf("SEQF\t%d\t%d\n", p.first, p.second);
    std::map<int, int> dfunc(st.distinct_functions.begin(),
                             st.distinct_functions.end());
    for (auto &p : dfunc)
        printf("DFUNC\t%d\t%d\n", p.first, p.second);
    printf("STATS\t%d\t%zu\n", (int)st.distinct_signatures,
           st.seqs_with_a_signature.size());
    return 0;
}
