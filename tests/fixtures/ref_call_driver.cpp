// Differential driver: compiles the reference's FULL inference path —
// process_aa_seq's HitSet automaton and find_best_call's
// collapse/bridge/fusion/margin scoring (call_functions.h/.tcc, verbatim
// from the read-only reference tree) — against the std-only shim headers
// in ./shims, and drives it from a text k-mer db + FASTA on stdin.
//
// Usage: ref_call_driver KMER_DB_TSV FUNCTION_INDEX [FLAGS [MIN_HITS [MAX_GAP]]]
//   KMER_DB_TSV lines: kmer \t avg_from_end \t function_index \t mean \t median \t var
//   FLAGS bit0: ignore_hypothetical
// Output (stdout), per sequence in FASTA order:
//   HIT  \t id \t pos \t fI                      (each accepted fetch hit)
//   CALL \t id \t start \t end \t count \t fI \t median \t mad
//   BEST \t id \t fI \t score \t score_offset \t function
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <map>  // operators.h uses std::map without including <map>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include <boost/filesystem.hpp>
namespace fs = boost::filesystem;

#include "call_functions.h"

struct MapKmerDb {
    static const int KmerSize = 8;
    std::unordered_map<std::string, StoredKmerData> map;

    template <typename CB>
    void fetch(const Kmer<8> &k, CB cb, int &ec) const {
        std::string key(k.begin(), k.end());
        auto it = map.find(key);
        if (it != map.end())
            cb(it->second);
        ec = 0;
    }
};

int main(int argc, char **argv) {
    if (argc < 3) {
        std::cerr << "usage: ref_call_driver kmer_db function_index [flags [min_hits [max_gap]]]\n";
        return 2;
    }
    MapKmerDb db;
    {
        std::ifstream kin(argv[1]);
        std::string line;
        while (std::getline(kin, line)) {
            if (line.empty())
                continue;
            std::istringstream ss(line);
            std::string kmer;
            unsigned a, f, mean, med, var;
            ss >> kmer >> a >> f >> mean >> med >> var;
            StoredKmerData kd;
            kd.avg_from_end = (uint16_t)a;
            kd.function_index = (FunctionIndex)f;
            kd.mean = (uint16_t)mean;
            kd.median = (uint16_t)med;
            kd.var = (uint16_t)var;
            db.map.emplace(kmer, kd);
        }
    }
    int flags = argc > 3 ? atoi(argv[3]) : 0;
    int min_hits = argc > 4 ? atoi(argv[4]) : 5;
    int max_gap = argc > 5 ? atoi(argv[5]) : 200;

    FunctionCaller<MapKmerDb> caller(db, fs::path(argv[2]), min_hits, max_gap);
    caller.ignore_hypothetical(flags & 1);

    FastaParser parser;
    parser.set_callback([&caller](const std::string &id, const std::string &seq) {
        if (id.empty())
            return 0;
        auto calls = std::make_shared<std::vector<KmerCall>>();
        auto hit_cb = [](const std::string &idstr, const Kmer<8> &kmer,
                         size_t offset, double seqlen,
                         const StoredKmerData &kd) {
            printf("HIT\t%s\t%zu\t%u\n", idstr.c_str(), offset,
                   (unsigned)kd.function_index);
        };
        caller.process_aa_seq(id, seq, calls, hit_cb);
        for (auto &c : *calls)
            printf("CALL\t%s\t%u\t%u\t%d\t%u\t%u\t%.9g\n", id.c_str(),
                   c.start, c.end, c.count, (unsigned)c.function_index,
                   c.protein_length_median,
                   (double)c.protein_length_med_avg_dev);
        FunctionIndex fi;
        std::string func;
        // find_best_call leaves score_offset UNASSIGNED when calls is
        // empty (call_functions.tcc:354-357 returns before touching it;
        // the reference CLI never reads it on that path) — pre-zero it
        // to match the spec's defined behavior (golden/call.py).
        float score = 0.0f, offset = 0.0f;
        caller.find_best_call(id, *calls, fi, func, score, offset);
        printf("BEST\t%s\t%u\t%.9g\t%.9g\t%s\n", id.c_str(), (unsigned)fi,
               (double)score, (double)offset, func.c_str());
        return 0;
    });
    parser.parse(std::cin);
    parser.parse_complete();
    return 0;
}
