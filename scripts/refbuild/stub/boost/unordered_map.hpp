// boost::unordered_map -> std with boost's ADL hash_value protocol
// (scratch parity build)
#ifndef STUB_BOOST_UNORDERED_MAP
#define STUB_BOOST_UNORDERED_MAP 1
#include <cstddef>
#include <unordered_map>
namespace boost {
/** boost::hash: defers to the type's ADL hash_value(). */
template <class K>
struct hash {
	std::size_t operator()(const K& k) const {
		return static_cast<std::size_t>(hash_value(k));
	}
};
template <class K, class V>
using unordered_map = std::unordered_map<K, V, hash<K> >;
}
#endif
