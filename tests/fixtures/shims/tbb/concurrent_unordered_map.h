#pragma once
#include <functional>
#include <unordered_map>

namespace tbb {

template <class K, class V, class Hash = std::hash<K>,
          class Eq = std::equal_to<K>>
class concurrent_unordered_map : public std::unordered_map<K, V, Hash, Eq> {
public:
    using base = std::unordered_map<K, V, Hash, Eq>;
    using base::base;
    struct range_type {
        typename base::iterator b, e;
        typename base::iterator begin() const { return b; }
        typename base::iterator end() const { return e; }
    };
    range_type range() { return {this->begin(), this->end()}; }
};

template <class K, class V, class Hash = std::hash<K>,
          class Eq = std::equal_to<K>>
class concurrent_unordered_multimap
    : public std::unordered_multimap<K, V, Hash, Eq> {
public:
    using base = std::unordered_multimap<K, V, Hash, Eq>;
    using base::base;
    struct range_type {
        typename base::iterator b, e;
        typename base::iterator begin() const { return b; }
        typename base::iterator end() const { return e; }
    };
    // std::unordered_multimap keeps equivalent keys adjacent in
    // iteration, which is all the reference's group-scan relies on
    // (signature_build.tcc:186-208)
    range_type range() { return {this->begin(), this->end()}; }
};

}  // namespace tbb
