// Differential driver for the reference's matrix-distance path
// (matrix_distance.h::MatrixDistance::compute, verbatim): the +-2*sigma
// hit length filter (var==0 -> sigma = 0.1*seqlen), per-k-mer id sets,
// and pairwise counting.  Compiled with the std-only shims (TBB
// containers run serially; iteration order of the output is
// unordered-map order — the test compares rows as a set).
//
// Usage: ref_matrix_driver KMER_DB_TSV FUNCTION_INDEX FASTA OUT_TSV
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <map>  // operators.h uses std::map without including <map>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include <boost/filesystem.hpp>
namespace fs = boost::filesystem;

#include "call_functions.h"
#include "matrix_distance.h"

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
    if (argc != 5) {
        std::cerr << "usage: ref_matrix_driver kmer_db function_index fasta out\n";
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
    FunctionCaller<MapKmerDb> caller(db, fs::path(argv[2]));
    // NOTE: the single-path MatrixDistance ctor stores a reference to a
    // braced TEMPORARY vector (matrix_distance.h:36-38, dangling); use
    // the vector ctor with a named vector like -folder/-merge do.
    std::vector<fs::path> in_files{fs::path(argv[3])};
    fs::path out(argv[4]);
    MatrixDistance<FunctionCaller<MapKmerDb>> md(caller, in_files, out, false);
    md.compute();
    return 0;
}
