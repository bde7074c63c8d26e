// minimal BFS support (scratch parity build): queue + visitor base
#ifndef STUB_BOOST_BFS
#define STUB_BOOST_BFS 1
#include <boost/graph/graph_traits.hpp>
#include <boost/property_map/property_map.hpp>
#include <deque>
namespace boost {
template <class T> inline void function_requires() {}
// no-op concept-check tags (BidirectionalBFS.h uses them)
template <class G> struct BidirectionalGraphConcept {};
template <class M, class K> struct ReadWritePropertyMapConcept {};
template <class T>
class queue : public std::deque<T> {
  public:
	void push(const T& v) { this->push_back(v); }
	void pop() { this->pop_front(); }
	T& top() { return this->front(); }
	const T& top() const { return this->front(); }
};
}
#endif
